"""Build the processed training dataset from raw sensor data
(reference: scripts/construct_dataset_parallel.py).

Re-integrates stored depth images (optionally single-view, optionally with
depth noise) into 40^3 TSDF grids via the on-device fusion kernel, converts
the grasp table to voxel units, and extracts workspace-cropped point clouds.
"""

import argparse
import multiprocessing as mp
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.core import io
from giga_tpu.core.perception import create_tsdf
from giga_tpu.sim.noise import apply_noise

RESOLUTION = 40


def process_one_scene(args, size, intrinsic, path):
    if path.suffix != ".npz":
        return path.stem
    depth_imgs, extrinsics = io.read_sensor_data(args.raw, path.stem)
    depth_imgs = np.array([apply_noise(d, args.add_noise) for d in depth_imgs])
    view = [0] if args.single_view else slice(None)
    tsdf = create_tsdf(size, RESOLUTION, depth_imgs[view], intrinsic, extrinsics[view])
    io.write_voxel_grid(args.dataset, path.stem, tsdf.get_grid())

    pc = create_tsdf(size, 120, depth_imgs[view], intrinsic, extrinsics[view]).get_cloud()
    lower, upper = np.r_[0.02, 0.02, 0.055], np.r_[0.28, 0.28, 0.30]
    pc = pc[np.all((pc >= lower) & (pc <= upper), axis=1)]
    io.write_point_cloud(args.dataset, path.stem, pc)
    return path.stem


def main(args):
    if args.single_view:
        print("Loading first view only!")
    (args.dataset / "scenes").mkdir(parents=True, exist_ok=True)
    (args.dataset / "point_clouds").mkdir(parents=True, exist_ok=True)

    size, intrinsic, _, finger_depth = io.read_setup(args.raw)
    assert np.isclose(size, 6.0 * finger_depth)
    voxel_size = size / RESOLUTION

    # grasp table in voxel units (i, j, k)
    df = io.read_df(args.raw)
    for c in ("x", "y", "z", "width"):
        df[c] /= voxel_size
    df = df.rename(columns={"x": "i", "y": "j", "z": "k"})
    io.write_df(df, args.dataset)

    files = sorted((args.raw / "scenes").iterdir())
    if args.num_proc > 1:
        with mp.Pool(processes=args.num_proc) as pool:
            for f in files:
                pool.apply_async(process_one_scene, args=(args, size, intrinsic, f))
            pool.close()
            pool.join()
    else:
        from tqdm import tqdm

        for f in tqdm(files):
            process_one_scene(args, size, intrinsic, f)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("raw", type=Path)
    parser.add_argument("dataset", type=Path)
    parser.add_argument("--num-proc", type=int, default=1)
    parser.add_argument("--single-view", action="store_true")
    parser.add_argument("--add-noise", type=str, default="")
    main(parser.parse_args())

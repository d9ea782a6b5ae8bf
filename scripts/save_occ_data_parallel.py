"""Pre-sample occupancy supervision points per scene
(reference: scripts/save_occ_data_parallel.py).

For each recorded mesh_pose_list, samples num_point_per_file * num_file
points in the scene bbox (or uniformly in the workspace), labels them by
mesh containment (native C++ kernel), and stores float16 shards under
occ/<scene_id>/.
"""

import argparse
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.utils.implicit import get_scene_from_mesh_pose_list, sample_iou_points


def sample_occ(mesh_pose_list_path, num_point, uniform):
    mesh_pose_list = np.load(mesh_pose_list_path, allow_pickle=True)["pc"]
    scene, mesh_list = get_scene_from_mesh_pose_list(mesh_pose_list, return_list=True)
    return sample_iou_points(mesh_list, scene.bounds, num_point, uniform=uniform)


def save_occ(mesh_pose_list_path, args):
    points, occ = sample_occ(
        mesh_pose_list_path, args.num_point_per_file * args.num_file, args.uniform
    )
    points = points.astype(np.float16).reshape(args.num_file, args.num_point_per_file, 3)
    occ = occ.reshape(args.num_file, args.num_point_per_file)
    name = Path(mesh_pose_list_path).stem
    save_root = Path(args.raw) / "occ" / name
    save_root.mkdir(parents=True, exist_ok=True)
    for i in range(args.num_file):
        np.savez(save_root / f"{i:04d}.npz", points=points[i], occ=occ[i])
    return name


def main(args):
    files = sorted(Path(args.raw).glob("mesh_pose_list/*.npz"))
    t0 = time.time()
    if args.num_proc > 1:
        done = []

        def log_result(name):
            done.append(name)
            if len(done) % 1000 == 0:
                print(f"{len(done):05d}/{len(files):05d} finished, {time.time() - t0:.0f}s")

        with mp.Pool(processes=args.num_proc) as pool:
            for f in files:
                pool.apply_async(save_occ, args=(f, args), callback=log_result)
            pool.close()
            pool.join()
    else:
        for f in files:
            save_occ(f, args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("raw", type=str)
    parser.add_argument("num_point_per_file", type=int)
    parser.add_argument("num_file", type=int)
    parser.add_argument("--num-proc", type=int, default=1)
    parser.add_argument("--uniform", action="store_true")
    main(parser.parse_args())

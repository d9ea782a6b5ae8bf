"""scripts/eval_geometry.py end-to-end on a miniature fixture dataset,
including the batched reconstruction path (--batch > 1)."""

import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

ROOT = Path(__file__).resolve().parents[1]


def _make_fixture(tmp_path, n_scenes=2):
    from giga_tpu.core import io
    from giga_tpu.core.grasp import Grasp, Label
    from giga_tpu.core.perception import CameraIntrinsic
    from giga_tpu.core.transform import Rotation, Transform
    from giga_tpu.geometry.mesh import box_mesh
    from giga_tpu.utils.synthetic import mesh_to_tsdf

    root, raw = tmp_path / "proc", tmp_path / "raw"
    (root / "scenes").mkdir(parents=True)
    (raw / "mesh_pose_list").mkdir(parents=True)
    io.write_setup(raw, 0.3, CameraIntrinsic(64, 48, 54, 54, 32, 24), 0.08, 0.05)
    rng = np.random.RandomState(0)
    mesh = box_mesh([0.1, 0.1, 0.1], center=(0, 0, 0))
    mesh_path = tmp_path / "obj.obj"
    mesh.export(mesh_path)
    for i in range(n_scenes):
        sid = f"s{i}"
        pose = np.eye(4)
        pose[:3, 3] = [0.12 + 0.04 * i, 0.15, 0.05]
        mpl = np.asarray([(str(mesh_path), 1.0, pose)], dtype=object)
        np.savez(raw / "mesh_pose_list" / (sid + ".npz"), pc=mpl)
        world = mesh.copy().apply_transform(pose)
        grid = np.squeeze(mesh_to_tsdf(world, 0.3, 40, rng=rng))
        io.write_voxel_grid(root, sid, grid[None].astype(np.float32))
        g = Grasp(Transform(Rotation.identity(), pose[:3, 3]), 0.04)
        io.write_grasp(raw, sid, g, Label.SUCCESS)
    return root, raw


def test_eval_geometry_main_batched(tmp_path):
    import jax

    from giga_tpu.models.registry import get_network, save_params

    sys.path.insert(0, str(ROOT / "scripts"))
    import eval_geometry

    root, raw = _make_fixture(tmp_path)
    net, cfg = get_network("giga_geo")
    params = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 40, 40, 40), np.float32), None,
        np.zeros((1, 1, 3), np.float32),
    )
    ckpt = tmp_path / "giga_geo_rand.msgpack"
    save_params(params, ckpt)

    args = SimpleNamespace(
        model_path=str(ckpt), type="giga_geo", dataset=root, dataset_raw=raw,
        logdir=tmp_path / "eval", roi=False, th=0.5, num_point_occ=2000,
        resolution0=8, upsampling_steps=1, seed=3, batch=2,
    )
    eval_geometry.main(args)

    logdir = next((tmp_path / "eval").iterdir())
    summary = json.loads((logdir / "mean_results.json").read_text())
    # random-weights model: metrics exist and are finite (or nan when a mesh
    # came out empty); per-scene artifacts written for both scenes
    assert "iou" in summary and "chamfer-L1" in summary
    for i in range(2):
        assert (logdir / f"{i:05d}" / "results.json").exists()

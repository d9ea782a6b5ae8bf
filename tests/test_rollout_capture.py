"""Rollout capture -> offline rendering, end-to-end under the fake sim:
clutter_removal_single.run with periodic world snapshots (BtWorld
save_dir/save_freq -> mesh-pose pickles, reference
clutter_removal_single.py:22-97 + utils/saver.py), then rendered to PNG
frames by the software rasterizer (reference render_rollouts_nvisii.py)."""

import pickle

import numpy as np
import pytest

from tests.conftest import SIM_URDF_ROOT
from tests.test_sim_integration import heuristic_plan_fn


def test_capture_and_render_rollout(fake_pb, tmp_path):
    from giga_tpu.experiments import clutter_removal_single
    from giga_tpu.utils.render import SoftwareRenderer

    save_dir = tmp_path / "round_000"
    success, attempts, total = clutter_removal_single.run(
        grasp_plan_fn=heuristic_plan_fn,
        save_dir=save_dir,
        scene="pile",
        object_set="cubes",
        num_objects=2,
        n=3,
        seed=4,
        save_freq=200,
        urdf_root=str(SIM_URDF_ROOT),
    )
    assert attempts >= 1
    assert success >= 1
    snapshots = sorted(save_dir.glob("*.pkl"))
    assert snapshots, "periodic world snapshots must be written"
    # snapshot format: {name: (mesh_path, scale, Transform)}
    with open(snapshots[0], "rb") as f:
        snap = pickle.load(f)
    assert snap
    mesh_path, scale, pose = next(iter(snap.values()))
    assert hasattr(pose, "translation")

    r = SoftwareRenderer(width=96, height=64)
    r.render_rollout(save_dir, tmp_path / "frames")
    r.close()
    frames = sorted((tmp_path / "frames").glob("*.png"))
    assert len(frames) == len(snapshots)
    PIL = pytest.importorskip("PIL.Image")
    img = np.asarray(PIL.open(frames[0]))
    assert np.any(np.any(img[..., :3] != 255, axis=-1)), "scene must be visible"

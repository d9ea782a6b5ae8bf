"""Execute the simulation + benchmark stack end-to-end via the deterministic
fake-pybullet double (VERDICT round-1, item 2).

Covers the never-before-run code paths: BtWorld stepping/state/contacts,
camera depth rendering -> on-device TSDF fusion, the grasp-execution state
machine (pregrasp -> approach -> close -> retreat -> success check,
reference simulation.py:188-263), pile/packed scene generation, and the
clutter_removal.run() benchmark protocol with real rounds.csv / grasps.csv
artifacts (reference clutter_removal.py:22-125)."""

import numpy as np
import pytest

from giga_tpu.core.grasp import Grasp, Label
from giga_tpu.core.transform import Rotation, Transform

from tests.conftest import SIM_URDF_ROOT

TOP_DOWN = Rotation.from_euler("x", np.pi)  # grasp z points down


def make_sim(fake_pb, scene="pile", seed=7, **kw):
    from giga_tpu.sim.simulation import ClutterRemovalSim

    return ClutterRemovalSim(
        scene, "blocks", seed=seed, urdf_root=str(SIM_URDF_ROOT), **kw
    )


def heuristic_plan_fn(state, *_args, **_kw):
    """Oracle planner: top-down grasp centered on the highest visible blob."""
    pc = np.asarray(state.pc)
    if len(pc) == 0:
        return [], [], 0.0
    seed_pt = pc[pc[:, 2].argmax()]
    zmax = seed_pt[2]
    near = pc[np.linalg.norm(pc[:, :2] - seed_pt[:2], axis=1) < 0.02]
    center = near.mean(axis=0)
    pos = np.r_[center[:2], zmax - 0.02]
    return [Grasp(Transform(TOP_DOWN, pos), width=0.08)], [1.0], 0.001


class TestWorldBasics:
    def test_settle_and_contacts(self, fake_pb):
        sim = make_sim(fake_pb)
        sim.reset(3)
        assert sim.num_objects > 0
        # every object rests on a support and reports a contact
        for body in sim.world.bodies.values():
            if body.name in ("plane", "box"):
                continue
            assert np.linalg.norm(body.get_velocity()[0]) < 1e-6
            assert sim.world.get_contacts(body), body.name
            # on or above the table surface
            assert body.get_pose().translation[2] > sim.gripper.finger_depth - 1e-4

    def test_save_restore_state(self, fake_pb):
        sim = make_sim(fake_pb)
        sim.reset(2)
        poses = {u: b.get_pose().translation.copy() for u, b in sim.world.bodies.items()}
        sim.save_state()
        for b in sim.world.bodies.values():
            b.set_pose(Transform(Rotation.identity(), [0.9, 0.9, 0.9]))
        sim.restore_state()
        for u, b in sim.world.bodies.items():
            np.testing.assert_allclose(b.get_pose().translation, poses[u], atol=1e-9)


class TestSensing:
    def test_acquire_tsdf_sees_scene(self, fake_pb):
        sim = make_sim(fake_pb, seed=11)
        sim.reset(3)
        tsdf, pc, timing = sim.acquire_tsdf(n=3, N=3)
        grid = tsdf.get_grid()
        assert grid.shape == (1, 40, 40, 40)
        assert grid.max() > 0.5  # observed free space
        band = np.logical_and(grid > 1e-3, grid < 0.5).sum()
        assert band > 100  # a real surface band exists
        assert len(pc) > 50
        assert pc[:, 2].min() > 0.0 and pc[:, 2].max() < sim.size
        assert timing > 0

    def test_sideview_acquisition(self, fake_pb):
        sim = make_sim(fake_pb, scene="packed", seed=3, sideview=True)
        sim.reset(2)
        tsdf, pc, _ = sim.acquire_tsdf(n=1)
        assert tsdf.get_grid().max() > 0.5
        assert len(pc) > 10


class TestGraspExecution:
    def _object_top_grasp(self, sim):
        """Re-pose the object upright at a known spot and aim at its center."""
        body = next(
            b for b in sim.world.bodies.values() if b.name not in ("plane", "box")
        )
        body.set_pose(Transform(Rotation.identity(), [0.15, 0.15, 0.15]))
        sim.wait_for_objects_to_rest()
        c = body.get_pose().translation
        pos = np.r_[c[:2], c[2] + 0.01]
        return Grasp(Transform(TOP_DOWN, pos), width=0.08), body

    def test_success_removes_object(self, fake_pb):
        sim = make_sim(fake_pb, scene="packed", seed=5)
        sim.reset(1)
        n0 = sim.num_objects
        assert n0 >= 1
        grasp, _ = self._object_top_grasp(sim)
        label, width = sim.execute_grasp(grasp, remove=True, allow_contact=True)
        assert label == Label.SUCCESS
        assert 0.01 < width <= 0.08  # fingers blocked on the object
        assert sim.num_objects == n0 - 1

    def test_empty_space_grasp_fails(self, fake_pb):
        sim = make_sim(fake_pb, scene="packed", seed=5)
        sim.reset(1)
        pos = np.array([0.27, 0.27, 0.20])  # high above everything
        label, width = sim.execute_grasp(
            Grasp(Transform(TOP_DOWN, pos), 0.08), allow_contact=True
        )
        assert label == Label.FAILURE
        assert width == sim.gripper.max_opening_width

    def test_pregrasp_collision_fails(self, fake_pb):
        sim = make_sim(fake_pb, scene="packed", seed=5)
        sim.reset(1)
        # TCP below the table: the hand spawns intersecting it
        pos = np.array([0.15, 0.15, 0.02])
        label, width = sim.execute_grasp(
            Grasp(Transform(TOP_DOWN, pos), 0.08), allow_contact=False
        )
        assert label == Label.FAILURE


class TestBenchmarkProtocol:
    def test_run_produces_metrics_and_logs(self, fake_pb, tmp_path):
        from giga_tpu.experiments import clutter_removal

        gsr, dr = clutter_removal.run(
            grasp_plan_fn=heuristic_plan_fn,
            logdir=tmp_path,
            description="faketest",
            scene="pile",
            object_set="cubes",  # bars can clip the descending fingers
            num_objects=3,
            n=3,
            num_rounds=2,
            seed=4,
            silence=True,
            urdf_root=str(SIM_URDF_ROOT),
            result_path=tmp_path / "result.txt",
        )
        # the heuristic oracle must clear most of the table
        assert gsr > 50.0
        assert dr > 50.0
        logdir = next(p for p in tmp_path.iterdir() if p.is_dir())
        rounds = (logdir / "rounds.csv").read_text().strip().splitlines()
        grasps = (logdir / "grasps.csv").read_text().strip().splitlines()
        assert len(rounds) == 3  # header + 2 rounds
        assert len(grasps) >= 3  # header + attempts
        assert (tmp_path / "result.txt").read_text().startswith(f"{gsr:.2f}%")

        data = clutter_removal.Data(logdir)
        assert data.num_rounds() == 2
        assert data.success_rate() == pytest.approx(gsr)
        assert data.percent_cleared() == pytest.approx(dr)

"""PlannerService: micro-batched serving must be a transparent front-end —
same results as the single-scene planner, correct under partial batches,
concurrent submitters, bad inputs, and shutdown.

The reference has no serving layer (one scene per VGNImplicit.__call__);
this is new TPU-era surface, so the contract is pinned against our own
single-scene planner rather than a reference oracle.
"""

import threading

import numpy as np
import pytest

from giga_tpu.inference.planner import GIGAPlanner, State
from giga_tpu.inference.serving import PlannerService
from giga_tpu.models.registry import get_network
from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene


@pytest.fixture(scope="module")
def planner():
    import jax

    net, cfg = get_network("giga")
    rng = np.random.RandomState(0)
    t0 = np.zeros((1, 40, 40, 40), np.float32)
    p0 = np.zeros((1, 1, 3), np.float32)
    params = net.init(jax.random.PRNGKey(0), t0, p0, p0)
    return GIGAPlanner(net=net, model_cfg=cfg, params=params, best=True,
                       force_detection=True, low_th=0.05, qual_th=0.3,
                       rng=np.random.RandomState(0))


@pytest.fixture(scope="module")
def scenes():
    rng = np.random.RandomState(7)
    return [mesh_to_tsdf(random_scene(rng, 0.3), 0.3, 40, rng=rng)
            for _ in range(5)]


def _as_tuples(grasps, scores):
    return [(tuple(np.round(g.pose.translation, 6)), round(float(s), 6))
            for g, s in zip(grasps, scores)]


class TestPlannerService:
    def test_matches_single_scene_planner(self, planner, scenes):
        with PlannerService(planner, batch_size=4, max_wait_ms=1.0) as svc:
            futs = [svc.submit(t) for t in scenes]
            served = [f.result(timeout=300) for f in futs]
        for tsdf, (grasps, scores) in zip(scenes, served):
            ref_g, ref_s, _ = planner(State(tsdf=tsdf[None]))
            assert _as_tuples(grasps, scores) == _as_tuples(ref_g, ref_s)

    def test_partial_batch_padding(self, planner, scenes):
        """A single request (batch occupancy 1/4) must still resolve and
        match — padded slots must not leak into results."""
        with PlannerService(planner, batch_size=4, max_wait_ms=1.0) as svc:
            grasps, scores = svc.plan(scenes[0], timeout=300)
            st = svc.stats()
        ref_g, ref_s, _ = planner(State(tsdf=scenes[0][None]))
        assert _as_tuples(grasps, scores) == _as_tuples(ref_g, ref_s)
        assert st["requests"] == 1 and st["batches"] == 1
        assert st["mean_batch_occupancy"] == pytest.approx(0.25)

    def test_concurrent_submitters(self, planner, scenes):
        results = {}
        with PlannerService(planner, batch_size=4, max_wait_ms=5.0) as svc:
            def client(i):
                results[i] = svc.submit(scenes[i % len(scenes)]).result(300)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        assert len(results) == 8
        for i, (grasps, scores) in results.items():
            ref_g, ref_s, _ = planner(State(tsdf=scenes[i % len(scenes)][None]))
            assert _as_tuples(grasps, scores) == _as_tuples(ref_g, ref_s)

    def test_bad_input_rejected_at_submit(self, planner, scenes):
        """Wrong shapes are rejected synchronously (a bad grid batched with
        good requests would otherwise fail the whole batch)."""
        with PlannerService(planner, batch_size=2, max_wait_ms=1.0) as svc:
            with pytest.raises(ValueError, match="expected"):
                svc.submit(np.zeros((3, 3, 3), np.float32))
            # service keeps working
            grasps, scores = svc.plan(scenes[0], timeout=300)
        ref_g, ref_s, _ = planner(State(tsdf=scenes[0][None]))
        assert _as_tuples(grasps, scores) == _as_tuples(ref_g, ref_s)

    def test_cancel_does_not_kill_worker(self, planner, scenes):
        """A future cancelled between submit and batching is dropped (or,
        if the worker already packed it, completes) — either way the worker
        survives and keeps serving."""
        with PlannerService(planner, batch_size=2, max_wait_ms=1.0) as svc:
            futs = [svc.submit(scenes[i % len(scenes)]) for i in range(6)]
            for f in futs:
                f.cancel()  # races the worker; both outcomes are legal
            for f in futs:
                assert f.cancelled() or f.result(300) is not None
            grasps, scores = svc.plan(scenes[0], timeout=300)
        ref_g, ref_s, _ = planner(State(tsdf=scenes[0][None]))
        assert _as_tuples(grasps, scores) == _as_tuples(ref_g, ref_s)

    def test_closed_service_rejects(self, planner):
        svc = PlannerService(planner, batch_size=2)
        svc.close()
        svc.close()  # idempotent
        with pytest.raises(RuntimeError):
            svc.submit(np.zeros((40, 40, 40), np.float32))

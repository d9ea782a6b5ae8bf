"""Inference-time checkpoint ensemble (planner.build_ensemble_giga_planner_fn).

Contract: a K=1-equivalent ensemble (the same checkpoint twice) must
reproduce the single-checkpoint planner exactly — the mean of identical
probabilities/widths is the identity and the sign-aligned quaternion mean of
a quat with itself renormalizes to itself — and a real 2-member ensemble's
raw volumes must equal the member means computed by hand. The reference has
no analog (detection_implicit.py loads one network)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from giga_tpu.core.config import PlannerConfig
from giga_tpu.inference.planner import (
    GIGAPlanner,
    State,
    build_ensemble_giga_planner_fn,
    build_giga_planner_fn,
    stack_params,
)
from giga_tpu.models.registry import get_network


@pytest.fixture(scope="module")
def two_checkpoints():
    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    p0 = net.init(jax.random.PRNGKey(0), tsdf, p, p)
    p1 = net.init(jax.random.PRNGKey(7), tsdf, p, p)
    return net, cfg, p0, p1


@pytest.fixture(scope="module")
def scene_grid():
    rng = np.random.RandomState(3)
    return rng.rand(40, 40, 40).astype(np.float32)


class TestEnsemblePlanner:
    def test_duplicated_member_matches_single(self, two_checkpoints, scene_grid):
        net, cfg, p0, _ = two_checkpoints
        pcfg = PlannerConfig(force_detection=True, best=True)
        single = build_giga_planner_fn(net, cfg, pcfg, 0.3)
        ens = build_ensemble_giga_planner_fn(net, cfg, pcfg, 0.3)
        g = jnp.asarray(scene_grid)
        cands_s, raw_s = jax.device_get(single(p0, g, g))
        cands_e, raw_e = jax.device_get(ens(stack_params([p0, p0]), g, g))
        for a, b in zip(raw_s, raw_e):
            np.testing.assert_allclose(a, b, atol=1e-6)
        assert int(cands_s.count) == int(cands_e.count)
        n = int(cands_s.count)
        np.testing.assert_array_equal(cands_s.positions[:n], cands_e.positions[:n])
        np.testing.assert_allclose(cands_s.scores[:n], cands_e.scores[:n], atol=1e-6)

    def test_raw_volumes_are_member_means(self, two_checkpoints, scene_grid):
        net, cfg, p0, p1 = two_checkpoints
        pcfg = PlannerConfig(force_detection=True, best=True)
        single = build_giga_planner_fn(net, cfg, pcfg, 0.3)
        ens = build_ensemble_giga_planner_fn(net, cfg, pcfg, 0.3)
        g = jnp.asarray(scene_grid)
        _, (q0, r0, w0) = jax.device_get(single(p0, g, g))
        _, (q1, r1, w1) = jax.device_get(single(p1, g, g))
        _, (qe, re, we) = jax.device_get(ens(stack_params([p0, p1]), g, g))
        np.testing.assert_allclose(qe, (q0 + q1) / 2, atol=1e-5)
        np.testing.assert_allclose(we, (w0 + w1) / 2, atol=1e-4)
        # quaternion mean: sign-align member 1 to member 0, renormalize
        sign = np.sign(np.sum(r1 * r0, axis=-1, keepdims=True))
        sign[sign == 0] = 1.0
        m = (r0 + sign * r1) / 2
        m = m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
        np.testing.assert_allclose(re, m, atol=1e-5)
        # every combined quat is unit-norm
        np.testing.assert_allclose(np.linalg.norm(re, axis=-1), 1.0, atol=1e-5)

    def test_max_combine_duplicated_member_matches_single(
            self, two_checkpoints, scene_grid):
        net, cfg, p0, _ = two_checkpoints
        pcfg = PlannerConfig(force_detection=True, best=True)
        single = build_giga_planner_fn(net, cfg, pcfg, 0.3)
        ens = build_ensemble_giga_planner_fn(net, cfg, pcfg, 0.3,
                                             combine="max")
        g = jnp.asarray(scene_grid)
        _, raw_s = jax.device_get(single(p0, g, g))
        _, raw_e = jax.device_get(ens(stack_params([p0, p0]), g, g))
        for a, b in zip(raw_s, raw_e):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_max_combine_is_per_voxel_winner(self, two_checkpoints, scene_grid):
        net, cfg, p0, p1 = two_checkpoints
        pcfg = PlannerConfig(force_detection=True, best=True)
        single = build_giga_planner_fn(net, cfg, pcfg, 0.3)
        ens = build_ensemble_giga_planner_fn(net, cfg, pcfg, 0.3,
                                             combine="max")
        g = jnp.asarray(scene_grid)
        _, (q0, r0, w0) = jax.device_get(single(p0, g, g))
        _, (q1, r1, w1) = jax.device_get(single(p1, g, g))
        _, (qe, re, we) = jax.device_get(ens(stack_params([p0, p1]), g, g))
        np.testing.assert_allclose(qe, np.maximum(q0, q1), atol=1e-6)
        win1 = q1 > q0  # argmax member per voxel
        np.testing.assert_allclose(we, np.where(win1, w1, w0), atol=1e-6)
        # rot comes whole from the winning member — never blended
        np.testing.assert_allclose(re, np.where(win1[..., None], r1, r0),
                                   atol=1e-6)

    def test_unknown_combine_raises(self, two_checkpoints):
        net, cfg, _, _ = two_checkpoints
        pcfg = PlannerConfig(force_detection=True, best=True)
        with pytest.raises(ValueError, match="combine"):
            build_ensemble_giga_planner_fn(net, cfg, pcfg, 0.3,
                                           combine="median")

    def test_planner_wrapper_accepts_param_list(self, two_checkpoints, scene_grid):
        net, cfg, p0, p1 = two_checkpoints
        planner = GIGAPlanner(
            net=net, model_cfg=cfg, params=[p0, p1],
            force_detection=True, best=True, rng=np.random.RandomState(0),
        )
        grasps, scores, toc = planner(State(tsdf=scene_grid[None]))
        assert isinstance(grasps, list) and toc > 0
        assert all(s1 >= s2 for s1, s2 in zip(scores, scores[1:]))
        with pytest.raises(NotImplementedError):
            planner.plan_batch(scene_grid[None])

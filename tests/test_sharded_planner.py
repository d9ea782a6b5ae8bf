"""Spatially-sharded planner equals the single-device planner on an 8-device
CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from giga_tpu.core.config import PlannerConfig
from giga_tpu.inference.planner import build_giga_planner_fn, build_sharded_giga_planner_fn
from giga_tpu.models.registry import get_network
from giga_tpu.parallel.mesh import make_mesh


def test_sp_sharded_planner_matches_single_device():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="sp")
    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    pcfg = PlannerConfig(force_detection=True)

    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.rand(40, 40, 40).astype(np.float32))

    plan = build_giga_planner_fn(net, cfg, pcfg, 0.3)
    splan = build_sharded_giga_planner_fn(net, cfg, pcfg, 0.3, mesh)

    c1, raw1 = jax.device_get(plan(params, grid, grid))
    c2, raw2 = jax.device_get(splan(params, grid, grid))

    np.testing.assert_allclose(np.asarray(raw1[0]), np.asarray(raw2[0]), atol=1e-5)
    assert int(c1.count) == int(c2.count)
    n = int(c1.count)
    np.testing.assert_allclose(c1.scores[:n], c2.scores[:n], atol=1e-5)
    np.testing.assert_array_equal(c1.positions[:n], c2.positions[:n])

"""Sharded planners (spatial and data-parallel batch) equal the
single-device programs on an 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from giga_tpu.core.config import PlannerConfig
from giga_tpu.inference.planner import (
    build_batched_giga_planner_fn,
    build_giga_planner_fn,
    build_sharded_giga_planner_fn,
)
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


def test_dp_batch_sharded_serving_matches_unsharded():
    """Batch-axis sharding of the natively batched planner: every scene's
    grasp list equals the unsharded batched program."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="dp")
    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    pcfg = PlannerConfig(force_detection=True)

    rng = np.random.RandomState(1)
    B = 8
    grids = jnp.asarray(rng.rand(B, 40, 40, 40).astype(np.float32))

    bplan = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3)
    splan = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3, mesh=mesh)

    c1, _ = jax.device_get(bplan(params, grids, grids))
    c2, _ = jax.device_get(splan(params, grids, grids))

    np.testing.assert_array_equal(np.asarray(c1.count), np.asarray(c2.count))
    for b in range(B):
        n = int(np.asarray(c1.count)[b])
        np.testing.assert_allclose(
            np.asarray(c1.scores)[b, :n], np.asarray(c2.scores)[b, :n], atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(c1.positions)[b, :n], np.asarray(c2.positions)[b, :n]
        )


def test_dp_shard_map_pallas_serving_matches_unsharded():
    """The shard_map distribution used for the Pallas batched trunk (each
    device runs its whole per-shard program) must also reproduce the
    unsharded batched results. On CPU the pallas gate falls back to the XLA
    decode inside each shard, so this validates the distribution structure."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, axis="dp")
    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    pcfg = PlannerConfig(force_detection=True)

    rng = np.random.RandomState(2)
    B = 16  # 2 scenes per device
    grids = jnp.asarray(rng.rand(B, 40, 40, 40).astype(np.float32))

    bplan = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3)
    splan = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3, mesh=mesh,
                                          use_pallas=True)

    c1, _ = jax.device_get(bplan(params, grids, grids))
    c2, _ = jax.device_get(splan(params, grids, grids))

    np.testing.assert_array_equal(np.asarray(c1.count), np.asarray(c2.count))
    for b in range(B):
        n = int(np.asarray(c1.count)[b])
        np.testing.assert_allclose(
            np.asarray(c1.scores)[b, :n], np.asarray(c2.scores)[b, :n], atol=1e-5
        )


def test_composed_dp_sp_mesh_matches_unsharded():
    """2x4 dp*sp mesh: batch sharded over dp AND the dense decode's lattice
    x axis over sp in ONE program (the pod-slice composition, round-4
    VERDICT #7) — equals the unsharded batched planner."""
    assert len(jax.devices()) >= 8
    from jax.sharding import Mesh

    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    pcfg = PlannerConfig(force_detection=True)

    rng = np.random.RandomState(2)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))

    bplan = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3)
    cplan = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3, mesh=mesh2,
                                          sp_axis="sp")
    c1, _ = jax.device_get(bplan(params, grids, grids))
    c2, _ = jax.device_get(cplan(params, grids, grids))
    np.testing.assert_array_equal(np.asarray(c1.count), np.asarray(c2.count))
    np.testing.assert_allclose(np.asarray(c1.scores), np.asarray(c2.scores),
                               atol=1e-5)
    for b in range(2):
        n = int(np.asarray(c1.count)[b])
        np.testing.assert_array_equal(
            np.asarray(c1.positions)[b, :n], np.asarray(c2.positions)[b, :n])

"""plan_batch equals sequential single-scene planning."""

import numpy as np

import jax

from giga_tpu.inference.planner import GIGAPlanner, State
from giga_tpu.models.registry import get_network


def test_plan_batch_matches_sequential():
    import jax.numpy as jnp

    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    planner = GIGAPlanner(
        net=net, model_cfg=cfg, params=params, best=True, force_detection=True,
        low_th=0.1, qual_th=0.6, rng=np.random.RandomState(0),
    )
    rng = np.random.RandomState(3)
    grids = rng.rand(3, 40, 40, 40).astype(np.float32)

    batched = planner.plan_batch(grids)
    for i in range(3):
        grasps_i, scores_i, _ = planner(State(tsdf=grids[i][None]))
        bg, bs = batched[i]
        assert len(bg) == len(grasps_i)
        for a, b in zip(grasps_i, bg):
            np.testing.assert_allclose(a.pose.translation, b.pose.translation, atol=1e-6)
            assert a.width == b.width
        np.testing.assert_allclose(scores_i, bs, atol=1e-6)


def test_pipelined_async_fetch_measures_and_materializes():
    """Depth-k async-fetch throughput helper: returns a positive rate and
    every timed call's result reaches the host (the jitted fn is called the
    requested number of times)."""
    import jax.numpy as jnp

    from giga_tpu.utils.benchmark import pipelined_throughput_async

    calls = []

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    def counted(x):
        calls.append(1)
        return f(x)

    xs = [(jnp.full((16, 16), float(i)),) for i in range(4)]
    rate = pipelined_throughput_async(counted, xs, n=12, depth=3, repeats=2)
    assert rate > 0
    assert len(calls) == 1 + 2 * 12  # warm + repeats * n


def test_plan_stream_matches_sequential():
    """Lag-1 pipelined streaming returns exactly the per-scene results."""
    import jax.numpy as jnp

    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    planner = GIGAPlanner(
        net=net, model_cfg=cfg, params=params, best=True, force_detection=True,
        low_th=0.1, qual_th=0.6, rng=np.random.RandomState(0),
    )
    rng = np.random.RandomState(3)
    grids = rng.rand(3, 40, 40, 40).astype(np.float32)

    streamed = planner.plan_stream(list(grids))
    assert len(streamed) == 3
    for i in range(3):
        grasps_i, scores_i, _ = planner(State(tsdf=grids[i][None]))
        sg, ss = streamed[i]
        assert len(sg) == len(grasps_i)
        for a, b in zip(grasps_i, sg):
            np.testing.assert_allclose(a.pose.translation, b.pose.translation, atol=1e-6)
            assert a.width == b.width
        np.testing.assert_allclose(scores_i, ss, atol=1e-6)


def test_return_raw_optin_matches_raw_free_candidates():
    """The serving default returns (cands, None); return_raw=True returns
    the full fp32 volumes AND bit-identical candidates (the bf16->fp32
    widening of rot/width commutes with the top-k gather)."""
    import jax.numpy as jnp

    from giga_tpu.core.config import PlannerConfig
    from giga_tpu.inference.planner import build_batched_giga_planner_fn

    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    pcfg = PlannerConfig(best=True, force_detection=True, low_th=0.1,
                         qual_th=0.6)
    rng = np.random.RandomState(5)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))

    lean = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3)
    full = build_batched_giga_planner_fn(net, cfg, pcfg, 0.3, return_raw=True)
    c1, raw1 = jax.device_get(lean(params, grids, grids))
    c2, raw2 = jax.device_get(full(params, grids, grids))
    assert raw1 is None
    qual, rot, width = raw2
    assert qual.shape == (2, 40, 40, 40) and qual.dtype == np.float32
    assert width.shape == (2, 40, 40, 40)
    assert rot.shape[0] == 2 and rot.size == 2 * 4 * 40 ** 3
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Benchmark: scenes/sec through the full GIGA planner pipeline on device.

Measures the north-star metric from BASELINE.json: per-scene throughput of
40^3 TSDF encode + dense 40^3 grasp-grid decode + on-device postprocess
(smooth/mask/bound/NMS/top-K), i.e. the entire VGNImplicit.__call__ compute
(reference: detection_implicit.py:33-85) as one jitted XLA program.

Baseline: the reference PyTorch CPU path runs ~50 ms/scene (perception.py:108
documents 35 ms of host TSDF readout alone within a ~50 ms pipeline), i.e.
~20 scenes/sec. vs_baseline = ours / 20.

Prints exactly one JSON line to stdout; details go to stderr.
"""

import json
import sys
import time

import numpy as np

REFERENCE_SCENES_PER_SEC = 20.0  # ~50 ms/scene reference pipeline


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from giga_tpu.core.config import PlannerConfig
    from giga_tpu.inference.planner import build_giga_planner_fn
    from giga_tpu.models.registry import get_network

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    net, cfg = get_network("giga")
    rng_np = np.random.RandomState(0)
    tsdf0 = jnp.zeros((1, 40, 40, 40), jnp.float32)
    p0 = jnp.zeros((1, 1, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)

    planner_cfg = PlannerConfig(force_detection=True)
    plan = build_giga_planner_fn(net, cfg, planner_cfg, size=0.3)

    grids = [jnp.asarray(rng_np.rand(40, 40, 40).astype(np.float32)) for _ in range(16)]

    # compile + warmup
    t0 = time.time()
    cands, _ = plan(params, grids[0], grids[0])
    jax.block_until_ready(cands)
    log(f"compile+first run: {time.time() - t0:.1f}s")

    # blocked single-scene latency (the planner is called once per grasp in
    # the clutter-removal loop, so b=1 latency is the deployment number).
    # Best-of-3 medians: the remote-accelerator tunnel adds sporadic
    # multi-hundred-us noise that medians alone don't reject.
    def latency_run(iters=100):
        lat = []
        for i in range(iters):
            t0 = time.perf_counter()
            cands, _ = plan(params, grids[i % 16], grids[i % 16])
            jax.block_until_ready(cands)
            lat.append(time.perf_counter() - t0)
        return float(np.median(lat))

    dt = min(latency_run() for _ in range(3))
    scenes_per_sec = 1.0 / dt
    log(f"single-scene blocked latency (best-of-3 medians): {dt * 1e3:.3f} ms -> {scenes_per_sec:.1f} scenes/s")

    # pipelined throughput: overlap dispatch with device execution
    iters = 400
    t0 = time.perf_counter()
    for i in range(iters):
        cands, _ = plan(params, grids[i % 16], grids[i % 16])
    jax.block_until_ready(cands)
    pipelined_sps = iters / (time.perf_counter() - t0)
    log(f"pipelined throughput: {pipelined_sps:.1f} scenes/s")

    def guarded(label, fn, default=float("nan")):
        """Secondary metrics must never kill the primary JSON line."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            log(f"{label} failed: {type(e).__name__}: {e}")
            return default

    # batched serving throughput (vmapped full pipeline)
    B = 64
    batch = jnp.stack([grids[i % 16] for i in range(B)])
    def run_batched():
        vplan = jax.jit(jax.vmap(plan.__wrapped__, in_axes=(None, 0, 0)))
        jax.block_until_ready(vplan(params, batch, batch))
        ts = []
        for _ in range(30):
            t0 = time.perf_counter()
            jax.block_until_ready(vplan(params, batch, batch))
            ts.append(time.perf_counter() - t0)
        sps = B / float(np.median(ts))
        log(f"batched (B={B}) throughput: {sps:.1f} scenes/s")
        return sps

    batched_sps = guarded("batched", run_batched)

    # --- remaining BASELINE.json configs -----------------------------------

    def blocked_median(f, *args, n=50):
        jax.block_until_ready(f(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # VGN dense 3D-CNN planner on a single 40^3 TSDF
    from giga_tpu.inference.planner import build_vgn_planner_fn

    def run_vgn():
        vgn_net, _ = get_network("vgn")
        vgn_params = vgn_net.init(jax.random.PRNGKey(1), tsdf0)
        vgn_plan = build_vgn_planner_fn(vgn_net, planner_cfg, size=0.3)
        dtv = blocked_median(vgn_plan, vgn_params, grids[0], grids[0])
        log(f"vgn planner: {dtv * 1e3:.3f} ms/scene")
        return dtv

    vgn_dt = guarded("vgn", run_vgn)

    # GIGA-Aff: affordance decode at sampled grasp centers (no occ head)
    def run_aff():
        aff_net, aff_cfg = get_network("giga_aff")
        aff_params = aff_net.init(jax.random.PRNGKey(2), tsdf0, p0, None)
        aff_plan = build_giga_planner_fn(aff_net, aff_cfg, planner_cfg, size=0.3)
        dta = blocked_median(aff_plan, aff_params, grids[0], grids[0])
        log(f"giga_aff planner: {dta * 1e3:.3f} ms/scene")
        return dta

    aff_dt = guarded("giga_aff", run_aff)

    # GIGA-Geo: 100k occupancy queries per scene (reconstruction workload)
    def run_geo():
        geo_net, geo_cfg = get_network("giga_geo")
        qp = jnp.zeros((1, 1, 3), jnp.float32)
        geo_params = geo_net.init(jax.random.PRNGKey(3), tsdf0, None, qp)
        pts100k = jnp.asarray(rng_np.uniform(-0.5, 0.5, (1, 100000, 3)), jnp.float32)
        geo_query = jax.jit(
            lambda pp, grid, pts: geo_net.apply(
                pp, geo_net.apply(pp, grid, method="encode"), pts, method="decode_occupancy"
            )
        )
        dtg = blocked_median(geo_query, geo_params, grids[0][None], pts100k)
        log(f"giga_geo encode+100k occ queries: {dtg * 1e3:.3f} ms/scene")
        return dtg

    geo_dt = guarded("giga_geo", run_geo)

    # training-step throughput (batch 32, 2048 occ points — reference defaults)
    from giga_tpu.train.trainer import create_train_state, make_train_step

    state = create_train_state(net, cfg, jax.random.PRNGKey(0))
    step = make_train_step(net, cfg)
    Bt, Nt = 32, 2048
    batch = {
        "tsdf": jnp.asarray(rng_np.rand(Bt, 40, 40, 40), jnp.float32),
        "pos": jnp.asarray(rng_np.uniform(-0.4, 0.4, (Bt, 3)), jnp.float32),
        "label": jnp.asarray(rng_np.randint(0, 2, Bt), jnp.float32),
        "rotations": jnp.asarray(rng_np.randn(Bt, 2, 4), jnp.float32),
        "width": jnp.asarray(rng_np.rand(Bt), jnp.float32),
        "pos_occ": jnp.asarray(rng_np.uniform(-0.4, 0.4, (Bt, Nt, 3)), jnp.float32),
        "occ": jnp.asarray(rng_np.randint(0, 2, (Bt, Nt)), jnp.float32),
    }
    def run_train():
        st, terms = step(state, batch)
        jax.block_until_ready(terms["loss_all"])
        ts = []
        cur = st
        for _ in range(20):
            t0 = time.perf_counter()
            cur, terms = step(cur, batch)
            jax.block_until_ready(terms["loss_all"])
            ts.append(time.perf_counter() - t0)
        sps = Bt / float(np.median(ts))
        log(f"train step (B={Bt}): {np.median(ts) * 1e3:.2f} ms -> {sps:.0f} samples/s")
        return sps

    train_sps = guarded("train", run_train)

    result = {
        "metric": "giga_planner_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 2),
        "pipelined_scenes_per_sec": round(pipelined_sps, 2),
        "batched_scenes_per_sec": round(batched_sps, 2),
        "train_samples_per_sec": round(train_sps, 2),
        "single_scene_ms": round(dt * 1e3, 3),
        "vgn_scene_ms": round(vgn_dt * 1e3, 3),
        "giga_aff_scene_ms": round(aff_dt * 1e3, 3),
        "giga_geo_100k_queries_ms": round(geo_dt * 1e3, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Benchmark: scenes/sec through the full GIGA planner pipeline on device.

Measures the north-star metric from BASELINE.json: per-scene throughput of
40^3 TSDF encode + dense 40^3 grasp-grid decode + on-device postprocess
(smooth/mask/bound/NMS/top-K), i.e. the entire VGNImplicit.__call__ compute
(reference: detection_implicit.py:33-85) as one jitted XLA program.

Timing methodology (round 2 fix): the axon remote backend's
``block_until_ready`` does NOT synchronize — it returns in dispatch time
while execution is still queued, which silently inflated round-1 numbers by
up to ~50x. Every number here is a marginal-slope measurement with a true
host fetch as the barrier (giga_tpu/utils/benchmark.py).

Process isolation (round 2 fix #2): long single-process benchmark sessions
through the tunnel start failing with spurious INVALID_ARGUMENT errors once
many programs have been compiled/run; each metric section therefore runs in
its own subprocess (fresh backend), and this parent merges their partial
JSON. Set BENCH_SECTION to run one section in-process.

Time discipline (round 3 fix — round 2's artifact was lost to rc:124):
- A persistent XLA compilation cache (.jax_cache/, JAX_COMPILATION_CACHE_DIR)
  makes the ~350 s tunnel compiles a one-time cost across sections AND across
  rounds; a warmed cache brings the whole run to minutes.
- A global wall-clock budget (BENCH_BUDGET_S, default 1200 s — well under the
  driver's kill timeout) bounds the run: each section gets at most the
  remaining budget, later sections are skipped when it runs out, and the
  merged partial JSON still prints.
- Sections emit their partial metric dict to stdout after EVERY metric, and
  the parent parses the last valid JSON line even from a timed-out section,
  so no completed measurement is ever lost.
- The headline planner section runs first; the rolling merged result is also
  written to bench_partial.json after each section as a crash-safe record.

Baseline: the reference PyTorch CPU path runs ~50 ms/scene (perception.py:108
documents 35 ms of host TSDF readout alone within a ~50 ms pipeline), i.e.
~20 scenes/sec. vs_baseline = ours / 20.

Prints exactly one JSON line to stdout; details go to stderr.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_SCENES_PER_SEC = 20.0  # ~50 ms/scene reference pipeline
V5E_PEAK_BF16 = 197e12  # FLOP/s
SECTIONS = ("planner", "batched", "models", "train", "meshgen")
# worst-case caps with a COLD compile cache (tunnel compiles can run 5-10x
# slow); the global budget below is what actually bounds the run
SECTION_TIMEOUT_S = {"batched": 1100, "train": 900}
DEFAULT_SECTION_TIMEOUT_S = 700
GLOBAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
FINAL_RESERVE_S = 10.0  # always keep time to print the merged JSON
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
PARTIAL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_partial.json"
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _clean(d):
    return {
        k: (None if isinstance(v, float) and not np.isfinite(v) else v)
        for k, v in d.items()
    }


class Collector(dict):
    """Rolling per-section result; re-prints the whole dict as a JSON line
    after every metric so a killed section still yields its finished work."""

    def put(self, **kv):
        self.update(kv)
        print(json.dumps(_clean(self)), flush=True)

    def fail(self, label, msg):
        """Record a stage failure LOUDLY in the JSON (VERDICT r4 #5): a null
        metric must be distinguishable from 'budget ran out / not measured'."""
        errs = dict(self.get("errors") or {})
        errs[label] = msg
        self.put(errors=errs)


_ACTIVE_COLLECTOR = None


def guarded(label, fn, default=float("nan")):
    """Secondary metrics must never kill the primary JSON line — but a code
    failure in a shipped path must surface in the final JSON's ``errors``
    field, not silently become a null metric."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001
        log(f"{label} failed: {type(e).__name__}: {e}")
        if _ACTIVE_COLLECTOR is not None:
            _ACTIVE_COLLECTOR.fail(label, f"{type(e).__name__}: {e}")
        return default


def _giga_setup():
    import jax
    import jax.numpy as jnp

    from giga_tpu.core.config import PlannerConfig
    from giga_tpu.models.registry import get_network

    net, cfg = get_network("giga")
    rng_np = np.random.RandomState(0)
    tsdf0 = jnp.zeros((1, 40, 40, 40), jnp.float32)
    p0 = jnp.zeros((1, 1, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    planner_cfg = PlannerConfig(force_detection=True)
    grids = [jnp.asarray(rng_np.rand(40, 40, 40).astype(np.float32)) for _ in range(32)]
    return net, cfg, params, planner_cfg, grids, tsdf0, p0, rng_np


def section_planner(out: Collector):
    import jax.numpy as jnp

    from giga_tpu.inference.planner import build_giga_planner_fn
    from giga_tpu.utils.benchmark import dispatch_floor, true_latency

    net, cfg, params, planner_cfg, grids, _, _, _ = _giga_setup()

    def single_chain_latency(jplan):
        """Device-side serial chain over the single-scene planner (see
        serial_chain_latency — immune to the tunnel's replay caching)."""
        import functools

        import jax

        from giga_tpu.utils.benchmark import serial_chain_latency

        p_fn = getattr(jplan, "__wrapped__", jplan)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, p, g):
            def body(i, acc):
                cands, _ = p_fn(p, g + (acc * 1e-24), g)
                return acc + jnp.nansum(jnp.where(
                    jnp.isfinite(cands.scores), cands.scores, 0.0))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return serial_chain_latency(loop, (params, grids[0]), inner=32)

    # headline first: fp32 single-scene latency drives the top-level value
    plan = build_giga_planner_fn(net, cfg, planner_cfg, size=0.3)
    t0 = time.time()
    cands, _ = plan(params, grids[0], grids[0])
    np.asarray(cands.scores)
    log(f"compile+first run: {time.time() - t0:.1f}s")
    dt = single_chain_latency(plan)
    log(f"single-scene serial-chain latency: {dt * 1e3:.3f} ms"
        f" -> {1.0 / dt:.1f} scenes/s")
    out.put(single_scene_ms=round(dt * 1e3, 3))

    floor = dispatch_floor()
    log(f"dispatch floor (trivial program): {floor * 1e3:.3f} ms/call")
    out.put(dispatch_floor_ms=round(floor * 1e3, 3))

    def run_bf16_single():
        plan16 = build_giga_planner_fn(net, cfg, planner_cfg, size=0.3,
                                       dtype=jnp.bfloat16)
        cands, _ = plan16(params, grids[0], grids[0])
        np.asarray(cands.scores)
        d = single_chain_latency(plan16)
        log(f"single-scene bf16 trunk: {d * 1e3:.3f} ms -> {1.0 / d:.1f} scenes/s")
        return d

    bf16_dt = guarded("bf16 single", run_bf16_single)
    out.put(single_scene_bf16_ms=round(bf16_dt * 1e3, 3))

    def run_pipelined():
        from giga_tpu.utils.benchmark import (
            pipelined_throughput,
            pipelined_throughput_async,
        )

        plan16 = build_giga_planner_fn(net, cfg, planner_cfg, size=0.3,
                                       dtype=jnp.bfloat16)
        args = [(params, g, g) for g in grids]
        lag1 = pipelined_throughput(plan16, args)
        log(f"pipelined lag-1 sync fetch: {lag1:.1f} scenes/s "
            f"(tunnel RTT-bound: ~25 ms/fetch)")
        deep = pipelined_throughput_async(plan16, args, depth=8)
        log(f"pipelined depth-8 async fetch: {deep:.1f} scenes/s")
        return max(lag1, deep)

    out.put(pipelined_scenes_per_sec=round(guarded("pipelined", run_pipelined), 2))


def section_batched(out: Collector):
    import jax.numpy as jnp

    from giga_tpu.inference.planner import build_batched_giga_planner_fn
    from giga_tpu.utils.benchmark import true_latency

    net, cfg, params, planner_cfg, _, _, _, rng_np = _giga_setup()
    B = 64
    batches = [
        jnp.asarray(rng_np.rand(B, 40, 40, 40).astype(np.float32)) for _ in range(4)
    ]

    def roofline(bplan, dt_batch, label):
        """Roofline anchors from XLA's cost model + the true batch time."""
        try:
            cost = bplan.lower(params, batches[0], batches[0]).compile().cost_analysis()
            flops = float(cost.get("flops", float("nan")))
            bytes_moved = float(cost.get("bytes accessed", float("nan")))
            achieved = flops / dt_batch
            mfu = achieved / V5E_PEAK_BF16
            log(f"{label}: {flops / 1e9:.2f} GFLOP + {bytes_moved / 1e6:.0f} MB per batch"
                f" -> {achieved / 1e12:.3f} TFLOP/s achieved,"
                f" MFU {mfu * 100:.2f}% (vs v5e bf16 peak),"
                f" {bytes_moved / dt_batch / 1e9:.0f} GB/s apparent")
        except Exception as e:  # noqa: BLE001
            log(f"{label} cost analysis failed: {type(e).__name__}: {e}")

    def run_batched(dtype, label, use_pallas=False):
        import functools

        import jax

        from giga_tpu.utils.benchmark import serial_chain_latency

        bplan = build_batched_giga_planner_fn(net, cfg, planner_cfg, size=0.3,
                                              dtype=dtype, use_pallas=use_pallas)
        plan = getattr(bplan, "__wrapped__", bplan)

        # device-side serial chain: each iteration's input is perturbed by
        # the previous iteration's reduced output, so the tunnel cannot
        # replay-cache repeated dispatches (see serial_chain_latency)
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, p, g):
            def body(i, acc):
                cands, _ = plan(p, g + (acc * 1e-24), g)
                return acc + jnp.nansum(jnp.where(
                    jnp.isfinite(cands.scores), cands.scores, 0.0))
            import jax as _jax

            return _jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        d = serial_chain_latency(loop, (params, batches[0]))
        sps = B / d
        log(f"batched (B={B}, {label}) serial-chain throughput: {sps:.1f}"
            f" scenes/s ({d * 1e3:.2f} ms/batch)")
        roofline(bplan, d, f"{label} batched B={B}")
        return sps

    # best configuration first (the serving default), then the XLA baselines
    out.put(batched_bf16_pallas_scenes_per_sec=round(
        guarded("batched bf16+pallas",
                lambda: run_batched(jnp.bfloat16, "bf16+pallas",
                                    use_pallas=True)), 2))
    out.put(batched_bf16_scenes_per_sec=round(
        guarded("batched bf16", lambda: run_batched(jnp.bfloat16, "bf16")), 2))
    out.put(batched_scenes_per_sec=round(
        guarded("batched fp32", lambda: run_batched(None, "fp32")), 2))
    out.put(batched_fp32_pallas_scenes_per_sec=round(
        guarded("batched fp32+pallas",
                lambda: run_batched(None, "fp32+pallas", use_pallas=True)), 2))


def section_models(out: Collector):
    """VGN / GIGA-Aff / GIGA-Geo single-scene paths."""
    import jax
    import jax.numpy as jnp

    from giga_tpu.inference.planner import (
        build_giga_planner_fn,
        build_vgn_planner_fn,
    )
    from giga_tpu.models.registry import get_network
    from giga_tpu.utils.benchmark import serial_chain_latency

    _, _, _, planner_cfg, grids, tsdf0, p0, rng_np = _giga_setup()

    def chain_plan(jplan, params, grid, inner=32):
        """Serial-chain latency of a planner fn (see serial_chain_latency)."""
        import functools

        p_fn = getattr(jplan, "__wrapped__", jplan)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, p, g):
            def body(i, acc):
                cands, _ = p_fn(p, g + (acc * 1e-24), g)
                return acc + jnp.nansum(jnp.where(
                    jnp.isfinite(cands.scores), cands.scores, 0.0))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return serial_chain_latency(loop, (params, grid), inner=inner)

    def run_vgn():
        vgn_net, _ = get_network("vgn")
        vgn_params = vgn_net.init(jax.random.PRNGKey(1), tsdf0)
        vgn_plan = build_vgn_planner_fn(vgn_net, planner_cfg, size=0.3)
        cands, _ = vgn_plan(vgn_params, grids[0], grids[0])
        np.asarray(cands.scores)
        dtv = chain_plan(vgn_plan, vgn_params, grids[0])
        log(f"vgn planner: {dtv * 1e3:.3f} ms/scene")
        return dtv

    out.put(vgn_scene_ms=round(guarded("vgn", run_vgn) * 1e3, 3))

    def run_vgn_batched(B=64):
        """Batched VGN serving throughput (one conv program for B scenes)."""
        import functools

        from giga_tpu.inference.planner import build_batched_vgn_planner_fn

        vgn_net, _ = get_network("vgn")
        vgn_params = vgn_net.init(jax.random.PRNGKey(1), tsdf0)
        vplan = build_batched_vgn_planner_fn(vgn_net, planner_cfg, size=0.3)
        gb = jnp.stack([jnp.asarray(g) for g in grids * ((B + 31) // 32)])[:B]
        cands = vplan(vgn_params, gb, gb)
        np.asarray(cands.scores)
        p_fn = getattr(vplan, "__wrapped__", vplan)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, p, g):
            def body(i, acc):
                c = p_fn(p, g + (acc * 1e-24), g)
                return acc + jnp.nansum(jnp.where(
                    jnp.isfinite(c.scores), c.scores, 0.0))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        dt = serial_chain_latency(loop, (vgn_params, gb), inner=8)
        log(f"vgn batched (B={B}): {dt * 1e3:.2f} ms/batch "
            f"-> {B / dt:.0f} scenes/s")
        return B / dt

    out.put(vgn_batched_scenes_per_sec=round(
        guarded("vgn batched", run_vgn_batched), 2))

    def run_aff():
        aff_net, aff_cfg = get_network("giga_aff")
        aff_params = aff_net.init(jax.random.PRNGKey(2), tsdf0, p0, None)
        aff_plan = build_giga_planner_fn(aff_net, aff_cfg, planner_cfg, size=0.3)
        cands, _ = aff_plan(aff_params, grids[0], grids[0])
        np.asarray(cands.scores)
        dta = chain_plan(aff_plan, aff_params, grids[0])
        log(f"giga_aff planner: {dta * 1e3:.3f} ms/scene")
        return dta

    out.put(giga_aff_scene_ms=round(guarded("giga_aff", run_aff) * 1e3, 3))

    def run_geo():
        geo_net, geo_cfg = get_network("giga_geo")
        qp = jnp.zeros((1, 1, 3), jnp.float32)
        geo_params = geo_net.init(jax.random.PRNGKey(3), tsdf0, None, qp)
        pts = [
            jnp.asarray(rng_np.uniform(-0.5, 0.5, (1, 100000, 3)), jnp.float32)
            for _ in range(4)
        ]
        geo_query = jax.jit(
            lambda pp, grid, q: geo_net.apply(
                pp, geo_net.apply(pp, grid, method="encode"), q,
                method="decode_occupancy"
            )
        )
        np.asarray(geo_query(geo_params, grids[0][None], pts[0]))[:1]
        import functools

        geo_fn = geo_query.__wrapped__

        @functools.partial(jax.jit, static_argnames=("n",))
        def geo_loop(n, p, g, q):
            def body(i, acc):
                out = geo_fn(p, g + (acc * 1e-24), q)
                return acc + jnp.nansum(out) * 1e-6

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        from giga_tpu.utils.benchmark import serial_chain_latency as _scl

        dtg = _scl(geo_loop, (geo_params, grids[0][None], pts[0]), inner=16)
        log(f"giga_geo encode+100k occ queries: {dtg * 1e3:.3f} ms/scene")
        return dtg

    out.put(giga_geo_100k_queries_ms=round(guarded("giga_geo", run_geo) * 1e3, 3))


def section_train(out: Collector):
    """Training-step throughput (batch 32, 2048 occ points — reference defaults)."""
    import jax
    import jax.numpy as jnp

    from giga_tpu.train.trainer import create_train_state, make_train_step

    net, cfg, _, _, _, _, _, _ = _giga_setup()

    def run_train(dtype=None, label="fp32"):
        state = create_train_state(net, cfg, jax.random.PRNGKey(0))
        step = make_train_step(net, cfg, dtype=dtype)
        Bt, Nt = 32, 2048

        def mk_batch(seed):
            r = np.random.RandomState(seed)
            return {
                "tsdf": jnp.asarray(r.rand(Bt, 40, 40, 40), jnp.float32),
                "pos": jnp.asarray(r.uniform(-0.4, 0.4, (Bt, 3)), jnp.float32),
                "label": jnp.asarray(r.randint(0, 2, Bt), jnp.float32),
                "rotations": jnp.asarray(r.randn(Bt, 2, 4), jnp.float32),
                "width": jnp.asarray(r.rand(Bt), jnp.float32),
                "pos_occ": jnp.asarray(r.uniform(-0.4, 0.4, (Bt, Nt, 3)), jnp.float32),
                "occ": jnp.asarray(r.randint(0, 2, (Bt, Nt)), jnp.float32),
            }

        data = [mk_batch(s) for s in range(4)]
        # the step DONATES its state argument (trainer.py), so never reuse a
        # state that has been passed in once — thread the single live state
        # through every chain and fetch the last loss as the barrier
        live = {"state": state}
        cur, terms = step(state, data[0])
        live["state"] = cur
        np.asarray(terms["loss_all"])

        def run_n(n):
            t0 = time.perf_counter()
            cur, t = live["state"], None
            for i in range(n):
                cur, t = step(cur, data[i % 4])
            live["state"] = cur
            np.asarray(t["loss_all"])
            return time.perf_counter() - t0

        # short chains: long deferred step chains can trip the remote runtime
        lo = min(run_n(1) for _ in range(3))
        hi = min(run_n(9) for _ in range(3))
        dstep = (hi - lo) / 8
        sps = Bt / dstep
        log(f"train step (B={Bt}, {label}): {dstep * 1e3:.2f} ms -> {sps:.0f} samples/s")
        return sps

    out.put(train_samples_per_sec=round(guarded("train", run_train), 2))
    out.put(train_bf16_samples_per_sec=round(
        guarded("train bf16", lambda: run_train(jnp.bfloat16, "bf16 mixed")), 2))


def section_meshgen(out: Collector):
    """Warm mesh generation (reconstruction path; device-banded, 128^3)."""
    def run_meshgen():
        from giga_tpu.geometry.generation import MeshGenerator
        from giga_tpu.models.registry import get_network, load_params
        from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

        geo_net, _ = get_network("giga_geo")
        geo_params = load_params("checkpoints/synthetic_giga_geo.msgpack")
        gen = MeshGenerator(geo_net, geo_params, resolution0=32, upsampling_steps=2)
        r = np.random.RandomState(0)
        tsdf = mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r)
        gen.generate_mesh(tsdf, return_stats=False)  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            gen.generate_mesh(tsdf, return_stats=False)
            ts.append(time.perf_counter() - t0)
        single = float(np.median(ts))
        out.put(mesh_gen_ms_per_scene=round(single * 1e3, 1),
                mesh_gen_ms_spread=[round(min(ts) * 1e3, 1),
                                    round(max(ts) * 1e3, 1)])
        B = 8
        batch = np.stack([
            np.squeeze(mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r))
            for _ in range(B)
        ])
        gen.generate_meshes(batch)  # compile
        t0 = time.perf_counter()
        meshes = gen.generate_meshes(batch)
        batched = (time.perf_counter() - t0) / B
        assert all(len(m.faces) for m in meshes)
        log(f"mesh generation 128^3: {single * 1e3:.0f} ms/scene warm,"
            f" batched B={B}: {batched * 1e3:.0f} ms/scene")
        out.put(mesh_gen_batched_ms_per_scene=round(batched * 1e3, 1))

        # 256^3 via the single-program device refine chain (VERDICT r2 #4):
        # dense decode at resolution0 only, then per-level sparse shell
        # decode up to 256^3 (generation.py _build_refine_chain_eval)
        gen256 = MeshGenerator(geo_net, geo_params, resolution0=32,
                               upsampling_steps=3, strategy="refine")
        m, st = gen256.generate_mesh(tsdf)  # compile
        assert st.get("refine (device)"), "256^3 device refine not taken"
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            gen256.generate_mesh(tsdf, return_stats=False)
            ts.append(time.perf_counter() - t0)
        hi = float(np.median(ts))
        log(f"mesh generation 256^3 (device refine): {hi * 1e3:.0f} ms/scene "
            f"warm, {len(m.faces)} faces, bands {st['refine cells (band/points-per-level)']}")
        out.put(mesh_gen_256_ms_per_scene=round(hi * 1e3, 1),
                mesh_gen_256_ms_spread=[round(min(ts) * 1e3, 1),
                                        round(max(ts) * 1e3, 1)])

    guarded("meshgen", run_meshgen, default=None)


SECTION_FNS = {
    "planner": section_planner,
    "batched": section_batched,
    "models": section_models,
    "train": section_train,
    "meshgen": section_meshgen,
}


def _last_json_line(text: str) -> dict:
    for line in reversed((text or "").strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {}


def run_section_subprocess(name: str, timeout_s: float) -> dict:
    env = dict(os.environ, BENCH_SECTION=name)
    # persistent compile cache: the ~350 s tunnel compiles are paid once
    # across sections and across rounds (cache hits take <1 s)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as e:
        # the section died at the wall — keep every metric it already printed
        stdout = (e.stdout if isinstance(e.stdout, str)
                  else (e.stdout or b"").decode(errors="replace"))
        stderr = (e.stderr if isinstance(e.stderr, str)
                  else (e.stderr or b"").decode(errors="replace"))
        rc = "timeout"
        log(f"section {name}: timed out after {timeout_s:.0f}s (partial kept)")
    if stderr:
        sys.stderr.write(stderr)
    log(f"section {name}: {time.time() - t0:.0f}s, exit {rc}")
    return _last_json_line(stdout)


def main():
    section = os.environ.get("BENCH_SECTION")
    if section:
        if "JAX_COMPILATION_CACHE_DIR" in os.environ:
            import jax

            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_COMPILATION_CACHE_DIR"])
        global _ACTIVE_COLLECTOR
        out = Collector()
        _ACTIVE_COLLECTOR = out
        SECTION_FNS[section](out)
        print(json.dumps(_clean(out)))
        return

    # the parent stays backend-free: each section subprocess owns a fresh
    # tunnel session (see module docstring)
    deadline = time.time() + GLOBAL_BUDGET_S - FINAL_RESERVE_S
    merged = {}
    errors = {}  # {stage: message} — code failures, NOT budget skips
    for name in SECTIONS:
        remaining = deadline - time.time()
        if remaining < 45:
            log(f"section {name}: skipped (global budget exhausted,"
                f" {remaining:.0f}s left)")
            continue
        cap = SECTION_TIMEOUT_S.get(name, DEFAULT_SECTION_TIMEOUT_S)
        part = run_section_subprocess(name, min(cap, remaining))
        errors.update(part.pop("errors", None) or {})
        merged.update(part)
        merged["errors"] = errors
        try:  # crash-safe rolling record for the driver/judge
            with open(PARTIAL_PATH, "w") as f:
                json.dump(_clean(merged), f)
        except OSError:
            pass
    merged["errors"] = errors

    single_ms = merged.get("single_scene_ms")
    sps = 1e3 / single_ms if single_ms else float("nan")
    result = {
        "metric": "giga_planner_scenes_per_sec",
        "value": round(sps, 2),
        "unit": "scenes/s",
        "vs_baseline": round(sps / REFERENCE_SCENES_PER_SEC, 2),
        **merged,
        "timing": "marginal slope with host-fetch barrier (block_until_ready"
                  " does not sync on this backend); one subprocess per section;"
                  f" global budget {GLOBAL_BUDGET_S:.0f}s w/ persistent compile cache",
    }
    print(json.dumps(_clean(result)))


if __name__ == "__main__":
    main()

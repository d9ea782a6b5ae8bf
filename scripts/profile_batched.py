"""Stage-level roofline of the batched GIGA serving path (B scenes/program).

Prefix-differencing with the SERIAL-CHAIN protocol (utils/benchmark.py::
serial_chain_latency — round 3 caught the tunnel replay-caching the older
cycled-inputs protocol): each stage's cost = latency(prefix through stage)
- latency(previous prefix), measured as N serially-dependent invocations
inside one program with every output leaf reduced (reducing one leaf lets
XLA dead-code-eliminate the rest). Per-stage FLOPs and HBM bytes come from
XLA's own ``compile().cost_analysis()``, so MFU and achieved bandwidth are
reported per stage — the bottleneck table VERDICT r2 #2 / r3 #4 asked for.

Stages (reference hot loop analog: ConvONets decoder.py:133-176 +
unet.py:225; ours is the batched lattice-factorized pipeline):

    encode       conv stem + triplane axis-mean + 2D U-Net trunk
    + sample     factorized bilinear sampling onto the R^2 lattices
    + decode     affordance trunk on the R^3 lattice (XLA or Pallas)
    + postprocess  mask/bound/NMS/top-K (full batched planner)

Run on the TPU (default backend):
    python scripts/profile_batched.py --batch 64 --dtype bf16 --pallas
"""

from __future__ import annotations

import argparse
import contextlib
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e peak: 197 TFLOP/s bf16 (fp32 numbers are reported against the same
# MXU peak, matching bench.py's convention)
PEAK_FLOPS = 197e12


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--fold-b1", action="store_true")
    ap.add_argument("--hidden-bf16", action="store_true")
    ap.add_argument("--transposed", action="store_true",
                    help="(O, rows) Pallas head write (lane-friendly layout)")
    ap.add_argument("--resolution", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-hi", type=int, default=9)
    ap.add_argument("--stages", default=None,
                    help="comma-separated stage-name filter (substring match)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from giga_tpu.core.config import PlannerConfig
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        lattice_coords,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.inference.planner import build_batched_giga_planner_fn
    from giga_tpu.models.registry import get_network
    import functools

    from giga_tpu.utils.benchmark import dispatch_floor, serial_chain_latency

    B = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    net, cfg = get_network("giga")
    pcfg = PlannerConfig(resolution=args.resolution)
    rng = np.random.RandomState(0)
    tsdf0 = jnp.zeros((1, 40, 40, 40), jnp.float32)
    p0 = jnp.zeros((1, 1, 3), jnp.float32)
    params = jax.device_put(net.init(jax.random.PRNGKey(0), tsdf0, p0, p0))
    batches = [
        jnp.asarray(rng.rand(B, 40, 40, 40).astype(np.float32)) for _ in range(3)
    ]

    def cast(p, t):
        if dtype is None:
            return p, t
        return jax.tree.map(lambda a: a.astype(dtype), p), t.astype(dtype)

    def prec():
        return (jax.default_matmul_precision("highest") if dtype is None
                else contextlib.nullcontext())

    @jax.jit
    def stage_encode(params, tsdfs):
        with prec():
            p, t = cast(params["params"], tsdfs)
            if args.pallas and jax.default_backend() == "tpu":
                # the real --pallas serving path encodes via the fused
                # stem+pool kernel, not the XLA encoder
                from giga_tpu.ops.pallas.stem_kernel import (
                    can_encode_fused,
                    encode_planes_fused,
                )

                if can_encode_fused(cfg.encoder, tsdfs.shape):
                    return encode_planes_fused(
                        p["encoder"], t, cfg.encoder,
                        compute_dtype=(jnp.bfloat16 if dtype == jnp.bfloat16
                                       else jnp.float32),
                    )
            return net.apply(
                {"params": {"encoder": p["encoder"]}}, t, method="encode"
            )

    @jax.jit
    def stage_sample(params, tsdfs):
        with prec():
            planes = stage_encode.__wrapped__(params, tsdfs)
            coords = lattice_coords(pcfg.resolution)
            return sample_planes_on_lattice_batched(
                planes, coords, cfg.encoder.plane_resolution,
                cfg.decoder.padding,
            )

    @jax.jit
    def stage_decode(params, tsdfs):
        with prec():
            feats = stage_sample.__wrapped__(params, tsdfs)
            coords = lattice_coords(pcfg.resolution)
            p, _ = cast(params["params"], tsdfs)
            if args.pallas and jax.default_backend() == "tpu":
                from giga_tpu.ops.pallas.decoder_kernel import (
                    decode_affordance_dense_pallas_batched,
                )

                q, r, w = decode_affordance_dense_pallas_batched(
                    p["decoder_aff"], feats, coords, cfg.decoder.n_blocks,
                    compute_dtype=(jnp.bfloat16 if dtype == jnp.bfloat16
                                   else jnp.float32),
                    fold_b1=args.fold_b1, hidden_bf16=args.hidden_bf16,
                    transposed=args.transposed,
                )
            else:
                q, r, w = decode_affordance_dense_batched(
                    p["decoder_aff"], feats, coords, cfg.decoder.n_blocks
                )
            return q.astype(jnp.float32)

    full_fn = build_batched_giga_planner_fn(
        net, cfg, pcfg, 0.3, dtype=dtype, use_pallas=args.pallas,
        pallas_fold_b1=args.fold_b1, pallas_hidden_bf16=args.hidden_bf16,
        pallas_transposed=args.transposed,
    )

    def full(params, tsdfs):
        return full_fn(params, tsdfs, tsdfs)

    stages = [
        ("encode", stage_encode),
        ("+sample", stage_sample),
        ("+decode", stage_decode),
        ("full (post)", full),
    ]
    if args.stages:
        keys = [k.strip() for k in args.stages.split(",")]
        stages = [(n, f) for n, f in stages if any(k in n for k in keys)]

    floor = dispatch_floor(repeats=args.repeats)
    print(f"backend={jax.default_backend()} B={B} dtype={args.dtype} "
          f"pallas={args.pallas} transposed={args.transposed} "
          f"R={args.resolution} "
          f"dispatch_floor={floor * 1e3:.3f} ms", file=sys.stderr)

    def chain_latency(fn):
        """Serial-chain per-call seconds of fn(params, tsdfs)."""
        raw = getattr(fn, "__wrapped__", fn)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, t0):
            def body(i, acc):
                out = raw(params, t0 + acc * 1e-24)
                leaves = [l.astype(jnp.float32) for l in jax.tree.leaves(out)]
                return acc + sum(
                    jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0)) for l in leaves
                )

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return serial_chain_latency(loop, (batches[0],), inner=args.n_hi - 1,
                                    repeats=args.repeats)

    def cost_of(fn, fargs):
        try:
            c = fn.lower(*fargs).compile().cost_analysis()
            if isinstance(c, list):  # older jax returns [dict]
                c = c[0]
            return (float(c.get("flops", float("nan"))),
                    float(c.get("bytes accessed", float("nan"))))
        except Exception:
            return float("nan"), float("nan")

    prev_t, prev_fl, prev_by = 0.0, 0.0, 0.0
    print(f"{'stage':14s} {'ms':>9s} {'Δms':>9s} {'ΔGFLOP':>8s} {'ΔMB':>8s} "
          f"{'MFU%':>6s} {'GB/s':>7s} {'scenes/s':>9s}")
    for name, fn in stages:
        fn(params, batches[0])  # warm/compile
        t = chain_latency(fn)
        fl, by = (cost_of(fn, (params, batches[0])) if hasattr(fn, "lower")
                  else cost_of(full_fn, (params, batches[0], batches[0])))
        d_t = t - prev_t
        d_fl = fl - prev_fl if np.isfinite(fl) else float("nan")
        d_by = by - prev_by if np.isfinite(by) else float("nan")
        mfu = 100.0 * d_fl / d_t / PEAK_FLOPS if d_t > 0 else float("nan")
        bw = d_by / d_t / 1e9 if d_t > 0 else float("nan")
        print(f"{name:14s} {t * 1e3:9.3f} {d_t * 1e3:9.3f} {d_fl / 1e9:8.2f} "
              f"{d_by / 1e6:8.1f} {mfu:6.2f} {bw:7.1f} {B / t:9.1f}")
        prev_t, prev_fl, prev_by = t, fl, by


if __name__ == "__main__":
    main()

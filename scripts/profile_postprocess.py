"""Isolated A/B of the batched postprocess stage (mask -> bound -> select).

Round-4 follow-up: after the MXU-form gaussian blur (d26875b) and the
separable NMS max-filter (9296e9f) landed, the full-pipeline prefix
differencing showed postprocess at ~9.5 ms (was ~4) — this script measures
each variant in isolation with the serial-chain protocol so the regression
can be pinned to one op.

Variants: blur in {taps, matmul} x nms in {dense, separable}; plus
sub-stage chains (blur only, +mask, +bound, +select) for the winner.

Run: python scripts/profile_postprocess.py --batch 64
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-hi", type=int, default=17)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import giga_tpu.inference.postprocess as post
    from giga_tpu.core.config import PlannerConfig
    from giga_tpu.ops.filters import gaussian_kernel_1d, max_filter_3d
    from giga_tpu.utils.benchmark import serial_chain_latency

    B = args.batch
    cfg = PlannerConfig(resolution=40)
    voxel_size = 0.3 / cfg.resolution
    rng = np.random.RandomState(0)
    qual = jnp.asarray(rng.rand(B, 40, 40, 40).astype(np.float32))
    tsdf = jnp.asarray(rng.rand(B, 40, 40, 40).astype(np.float32))
    rot = jnp.asarray(rng.rand(B, 40, 40, 40, 4).astype(np.float32))
    width = jnp.asarray(rng.rand(B, 40, 40, 40).astype(np.float32) * 0.8)
    coords = np.stack(np.meshgrid(*([np.arange(40)] * 3), indexing="ij"), -1)
    positions = jnp.asarray((coords.astype(np.float32) + 0.5) / 40.0)

    # ---- blur variants -------------------------------------------------
    def blur_taps(vol, sigma=1.0, truncate=4.0):
        k = jnp.asarray(gaussian_kernel_1d(sigma, truncate))
        r = (k.shape[0] - 1) // 2

        def blur_axis(v, axis):
            v = jnp.moveaxis(v, axis, -1)
            shape = v.shape
            padded = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(r, r)], mode="edge")
            flat = padded.reshape(-1, padded.shape[-1])
            out = jax.vmap(lambda row: jnp.correlate(row, k, mode="valid"))(flat)
            return jnp.moveaxis(out.reshape(shape), -1, axis)

        for axis in range(vol.ndim - 3, vol.ndim):
            vol = blur_axis(vol, axis)
        return vol

    from giga_tpu.ops.filters import gaussian_blur_3d as blur_matmul

    # ---- nms variants --------------------------------------------------
    def nms_dense(vol, size):
        lo = size // 2
        hi = size - lo - 1
        lead = vol.ndim - 3
        return jax.lax.reduce_window(
            vol, -jnp.inf, jax.lax.max,
            window_dimensions=(1,) * lead + (size,) * 3,
            window_strides=(1,) * vol.ndim,
            padding=[(0, 0)] * lead + [(lo, hi)] * 3,
        )

    nms_sep = max_filter_3d

    def chain(fn, fargs):
        """Serial-chain per-call seconds of fn(*fargs); perturbs arg 0."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, a0):
            def body(i, acc):
                out = fn(a0 + acc * 1e-24, *fargs[1:])
                leaves = [l.astype(jnp.float32) for l in jax.tree.leaves(out)]
                return acc + sum(
                    jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0)) for l in leaves
                )

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return serial_chain_latency(loop, (fargs[0],), inner=args.n_hi - 1,
                                    repeats=args.repeats)

    def report(name, fn, fargs):
        t = chain(fn, fargs)
        print(f"{name:34s} {t * 1e3:8.3f} ms", flush=True)
        return t

    print(f"backend={jax.default_backend()} B={B}", flush=True)

    # primitive ops in isolation
    report("blur taps (correlate)", blur_taps, (qual,))
    report("blur matmul (HIGHEST)", blur_matmul, (qual,))
    report("nms dense 4^3 window", lambda q: nms_dense(q, cfg.max_filter_size), (qual,))
    report("nms separable 3x1D", lambda q: nms_sep(q, cfg.max_filter_size), (qual,))
    report("dilation (mask)", lambda t: post.masked_binary_dilation(
        t > cfg.out_th, ~((t > 1e-3) & (t < cfg.out_th)), 2), (tsdf,))

    # full postprocess with each blur x nms combination
    def full_post(q, blur, nms):
        saved = (post.gaussian_blur_3d, post.max_filter_3d)
        post.gaussian_blur_3d, post.max_filter_3d = blur, nms
        try:
            m = post.mask_quality(q, tsdf, width, cfg)
            m = post.bound_quality(m, voxel_size, cfg)
            return post.select_grasps_batched(m, rot, width, positions, cfg)
        finally:
            post.gaussian_blur_3d, post.max_filter_3d = saved

    for bname, blur in (("taps", blur_taps), ("matmul", blur_matmul)):
        for nname, nms in (("dense", nms_dense), ("sep", nms_sep)):
            report(f"postprocess blur={bname} nms={nname}",
                   lambda q, b=blur, n=nms: full_post(q, b, n), (qual,))


if __name__ == "__main__":
    main()

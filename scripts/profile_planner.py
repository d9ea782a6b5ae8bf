"""Stage-level latency decomposition of the single-scene GIGA planner.

Times each pipeline prefix with the true-barrier protocol
(giga_tpu/utils/benchmark.py) so the per-stage cost is the difference of
successive prefixes:

    encode            : voxel encoder -> triplane features (UNet2D trunk)
    + lattice sample  : factorized bilinear sampling onto the R^2 lattices
    + dense decode    : stacked affordance decoder on the R^3 lattice
    + postprocess     : mask/bound/NMS/top-K (full planner)

Run on the TPU (default backend):  python scripts/profile_planner.py
Options: --dtype bf16 --resolution 40 --repeats 3
"""

from __future__ import annotations

import argparse
import contextlib
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["fp32", "bf16"], default="fp32")
    ap.add_argument("--resolution", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-hi", type=int, default=33)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from giga_tpu.core.config import PlannerConfig
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense,
        lattice_coords,
        sample_planes_on_lattice,
    )
    from giga_tpu.inference.planner import build_giga_planner_fn
    from giga_tpu.models.registry import get_network
    from giga_tpu.utils.benchmark import dispatch_floor, true_latency

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    net, cfg = get_network("giga")
    pcfg = PlannerConfig(resolution=args.resolution)
    rng = np.random.RandomState(0)
    tsdf0 = jnp.zeros((1, 40, 40, 40), jnp.float32)
    p0 = jnp.zeros((1, 1, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    params = jax.device_put(params)

    grids = [jnp.asarray(rng.rand(40, 40, 40).astype(np.float32)) for _ in range(8)]

    def cast(p, t):
        if dtype is None:
            return p, t
        return jax.tree.map(lambda a: a.astype(dtype), p), t.astype(dtype)

    def prec():
        return (jax.default_matmul_precision("highest") if dtype is None
                else contextlib.nullcontext())

    @jax.jit
    def stage_conv_stem(params, tsdf):
        """Conv stem + axis-mean pooling only (encoder minus the U-Net)."""
        from giga_tpu.models.encoder import axis_mean_planes
        from giga_tpu.models.layers import ZBandedConvStem

        with prec():
            p, t = cast(params["params"], tsdf)
            conv_p = p["encoder"]["conv_in"]
            x = t[None][..., None]
            feat = jax.nn.relu(
                ZBandedConvStem(cfg.encoder.c_dim, cfg.encoder.kernel_size).apply(
                    {"params": conv_p}, x
                )
            )
            return axis_mean_planes(feat, cfg.encoder.plane_types)

    @jax.jit
    def stage_encode(params, tsdf):
        with prec():
            p, t = cast(params["params"], tsdf)
            planes = net.apply({"params": {"encoder": p["encoder"]}}, t[None],
                               method="encode")
            return {k: v[0] for k, v in planes.items()}

    @jax.jit
    def stage_sample(params, tsdf):
        with prec():
            planes = stage_encode.__wrapped__(params, tsdf)
            coords = lattice_coords(pcfg.resolution)
            return sample_planes_on_lattice(
                planes, coords, cfg.encoder.plane_resolution, cfg.decoder.padding)

    @jax.jit
    def stage_decode(params, tsdf):
        with prec():
            feats = stage_sample.__wrapped__(params, tsdf)
            coords = lattice_coords(pcfg.resolution)
            p, _ = cast(params["params"], tsdf)
            q, r, w = decode_affordance_dense(p["decoder_aff"], feats, coords,
                                              cfg.decoder.n_blocks)
            return q.astype(jnp.float32)

    full_fn = build_giga_planner_fn(net, cfg, pcfg, 0.3, dtype=dtype)

    def full(params, tsdf):
        return full_fn(params, tsdf, tsdf)

    stages = [
        ("conv stem + pool", stage_conv_stem),
        ("encode", stage_encode),
        ("encode+sample", stage_sample),
        ("encode+sample+decode", stage_decode),
        ("full planner", full),
    ]

    floor = dispatch_floor(repeats=args.repeats)
    print(f"backend={jax.default_backend()} dtype={args.dtype} "
          f"R={args.resolution} dispatch_floor={floor * 1e3:.3f} ms",
          file=sys.stderr)

    prev = 0.0
    rows = []
    for name, fn in stages:
        fn(params, grids[0])  # warm/compile
        t = true_latency(fn, [(params, g) for g in grids],
                         n_hi=args.n_hi, repeats=args.repeats)
        rows.append((name, t, t - prev))
        prev = t
    for name, t, d in rows:
        print(f"{name:24s} {t * 1e3:7.3f} ms  (stage +{d * 1e3:6.3f} ms)")


if __name__ == "__main__":
    main()

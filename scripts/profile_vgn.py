"""Stage/precision latency decomposition of the VGN dense planner.

Round-4 target (VERDICT #2): vgn_scene_ms <= 10 (from 57.4). Measures, with
the serial-chain protocol (utils/benchmark.py), the current shipped plan fn
and the candidate levers:

    plan fp32-highest     : shipped build_vgn_planner_fn
    net highest/default/bf16 : forward pass precision sweep
    enc / enc+dec / heads : stage split (default precision)
    fused heads           : qual+rot+width as ONE 6-channel k5 conv

Run on the TPU:  python scripts/profile_vgn.py
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from giga_tpu.core.config import PlannerConfig, VGNConfig
    from giga_tpu.inference.planner import build_vgn_planner_fn
    from giga_tpu.models.layers import TorchConv
    from giga_tpu.models.registry import get_network
    from giga_tpu.models.vgn import VGNNet, _upsample2
    from giga_tpu.utils.benchmark import serial_chain_latency

    net, cfg = get_network("vgn")
    rng = np.random.RandomState(0)
    tsdf0 = jnp.zeros((1, 40, 40, 40), jnp.float32)
    params = jax.device_put(net.init(jax.random.PRNGKey(0), tsdf0))
    grid = jnp.asarray(rng.rand(40, 40, 40).astype(np.float32))

    def chain(fn, *fargs, inner=args.inner):
        """fn(*fargs, grid-like) -> scalar-reducible pytree."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, g, *rest):
            def body(i, acc):
                out = fn(*rest, g + acc * 1e-24)
                # reduce EVERY output leaf: reducing just one lets XLA
                # dead-code-eliminate the other heads out of the measurement
                leaves = [l.astype(jnp.float32) for l in jax.tree.leaves(out)]
                return acc + sum(
                    jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0)) for l in leaves
                )

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return serial_chain_latency(loop, (grid,) + fargs, inner=inner)

    def report(tag, dt):
        print(f"{tag:34s} {dt * 1e3:8.3f} ms", flush=True)

    # 1. plan fn variants
    t0 = time.time()
    for tag, kw in [
        ("plan fp32-highest (old shipped)", dict(precision="highest")),
        ("plan fp32-default (new default)", dict()),
        ("plan bf16 trunk", dict(dtype=jnp.bfloat16)),
    ]:
        plan = build_vgn_planner_fn(net, PlannerConfig(), size=0.3, **kw)
        p_fn = getattr(plan, "__wrapped__", plan)
        report(tag, chain(lambda g, f=p_fn: f(params, g, g)[0]))
    print(f"  [plan section took {time.time() - t0:.0f}s incl. compile]",
          file=sys.stderr)

    # 1b. postprocess alone (mask/bound/NMS/top-K on precomputed volumes)
    import dataclasses

    from giga_tpu.inference.postprocess import (
        bound_quality, mask_quality, select_grasps,
    )
    from giga_tpu.inference.planner import _lattice_positions

    pcfg = dataclasses.replace(PlannerConfig(), min_width=1.33, max_width=9.33)
    qual0 = jnp.asarray(rng.rand(40, 40, 40).astype(np.float32))
    rot0 = jnp.asarray(rng.randn(40, 40, 40, 4).astype(np.float32))
    positions = _lattice_positions(jnp.arange(40, dtype=jnp.float32))

    def post(g):
        w = g * 5.0
        q = mask_quality(qual0 + g * 1e-24, g, w, pcfg)
        q = bound_quality(q, 0.3 / 40, pcfg)
        return select_grasps(q, rot0, w, positions, pcfg)

    report("postprocess only", chain(post))

    # 2. precision sweep on the bare forward
    def fwd(p, g):
        return net.apply(p, g[None])[0]

    def fwd_highest(p, g):
        with jax.default_matmul_precision("highest"):
            return net.apply(p, g[None])[0]

    report("net fwd fp32-highest", chain(lambda g: fwd_highest(params, g)))
    report("net fwd fp32-default", chain(lambda g: fwd(params, g)))

    bf16_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    report("net fwd bf16", chain(lambda g: fwd(bf16_params, g.astype(jnp.bfloat16))))

    # 3. stage split (default precision, fp32)
    p = params["params"]

    def enc_only(pp, g):
        x = g[None][..., None]
        for i, (f, k) in enumerate(zip(cfg.encoder_filters, cfg.encoder_kernels)):
            x = jax.nn.relu(TorchConv(f, k, strides=2).apply(
                {"params": pp[f"enc_conv{i + 1}"]}, x))
        return x

    def enc_dec(pp, g):
        x = enc_only(pp, g)
        for i, (f, k) in enumerate(zip(cfg.decoder_filters, cfg.decoder_kernels)):
            x = jax.nn.relu(TorchConv(f, k).apply(
                {"params": pp[f"dec_conv{i + 1}"]}, x))
            x = _upsample2(x)
        return x

    report("encoder only", chain(lambda g: enc_only(p, g)))
    report("encoder+decoder", chain(lambda g: enc_dec(p, g)))

    # 4. fused heads: one (5,5,5,16,6) conv == the three separate heads
    def fuse_heads(pp):
        ks = [pp[n]["conv"]["kernel"] for n in ("conv_qual", "conv_rot", "conv_width")]
        bs = [pp[n]["conv"]["bias"] for n in ("conv_qual", "conv_rot", "conv_width")]
        return jnp.concatenate(ks, axis=-1), jnp.concatenate(bs, axis=-1)

    fk, fb = fuse_heads(p)

    def fused_full(pp, g):
        x = enc_dec(pp, g)
        out = jax.lax.conv_general_dilated(
            x, fk, (1, 1, 1), [(2, 2)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + fb
        return out

    report("enc+dec+fused heads", chain(lambda g: fused_full(p, g)))

    # numerics check of the fusion
    q0 = net.apply(params, grid[None])[0][0]
    o = fused_full(p, grid)
    q1 = jax.nn.sigmoid(o[0, ..., 0])
    print("fused-head qual max|diff|:",
          float(jnp.abs(q1 - q0).max()), file=sys.stderr)


if __name__ == "__main__":
    main()

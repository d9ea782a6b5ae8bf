"""Stage breakdown of the giga_geo encode + N arbitrary-point occupancy
queries (the bench `giga_geo_100k_queries_ms` path; reference: eval_points
100k chunking, ConvONets generation.py:326-358).

Stages (each a real jit boundary, serial-chain measured, every output leaf
reduced so XLA cannot DCE heads out of the measurement):
  encode     TSDF -> triplane features
  +sample    + bilinear plane sampling at N query points (12 gathers)
  +trunk     + fc_p/5 ResNet blocks/occ head (= full decode_occupancy)

Usage: python scripts/profile_geo.py [--n 100000] [--repeats 3]
"""

import argparse
import functools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-hi", type=int, default=9)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing only)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from giga_tpu.models.decoder import query_planes
    from giga_tpu.models.registry import get_network
    from giga_tpu.utils.benchmark import dispatch_floor, serial_chain_latency

    net, cfg = get_network("giga_geo")
    rng = np.random.RandomState(0)
    tsdf0 = jnp.zeros((1, 40, 40, 40), jnp.float32)
    qp0 = jnp.zeros((1, 1, 3), jnp.float32)
    params = jax.device_put(net.init(jax.random.PRNGKey(3), tsdf0, None, qp0))
    grid = jnp.asarray(rng.rand(1, 40, 40, 40).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (1, args.n, 3)), jnp.float32)

    @jax.jit
    def stage_encode(params, grid, q):
        return net.apply(params, grid, method="encode")

    @jax.jit
    def stage_sample(params, grid, q):
        planes = stage_encode.__wrapped__(params, grid, q)
        return query_planes(planes, q, cfg.decoder)

    @jax.jit
    def stage_trunk(params, grid, q):
        planes = stage_encode.__wrapped__(params, grid, q)
        return net.apply(params, planes, q, method="decode_occupancy")

    from giga_tpu.ops.sampling import sample_planes_concat_mm

    def _mm_feats(planes, q, precision):
        return jax.vmap(
            lambda pb, qb: sample_planes_concat_mm(
                pb, qb, cfg.decoder.padding, precision=precision)
        )(planes, q)

    def make_mm_stages(precision, tag):
        @jax.jit
        def stage_sample_mm(params, grid, q):
            planes = stage_encode.__wrapped__(params, grid, q)
            return _mm_feats(planes, q, precision)

        @jax.jit
        def stage_trunk_mm(params, grid, q):
            planes = stage_encode.__wrapped__(params, grid, q)
            feats = _mm_feats(planes, q, precision)
            return net.apply(params, planes, q, feature=feats,
                             method="decode_occupancy")

        return [(f"+sample_mm[{tag}]", stage_sample_mm),
                (f"+trunk_mm[{tag}] (full)", stage_trunk_mm)]

    stages = [("encode", stage_encode), ("+sample", stage_sample),
              ("+trunk (full)", stage_trunk)]
    stages += make_mm_stages(None, "default")
    stages += make_mm_stages(jax.lax.Precision.HIGHEST, "highest")

    floor = dispatch_floor(repeats=args.repeats)
    print(f"backend={jax.default_backend()} N={args.n} "
          f"dispatch_floor={floor * 1e3:.3f} ms", file=sys.stderr)

    def chain_latency(fn):
        raw = fn.__wrapped__

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, g):
            def body(i, acc):
                out = raw(params, g + acc * 1e-24, pts)
                leaves = [l.astype(jnp.float32) for l in jax.tree.leaves(out)]
                return acc + sum(
                    jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0)) for l in leaves
                )

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return serial_chain_latency(loop, (grid,), inner=args.n_hi - 1,
                                    repeats=args.repeats)

    print(f"{'stage':<18} {'ms':>8} {'Δms':>8}", file=sys.stderr)
    prev = 0.0
    for name, fn in stages:
        dt = chain_latency(fn) * 1e3
        print(f"{name:<18} {dt:8.3f} {dt - prev:8.3f}", file=sys.stderr)
        prev = dt


if __name__ == "__main__":
    main()

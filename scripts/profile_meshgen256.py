"""Per-stage serial-chain roofline of the 256^3 device refine chain.

The refine program (generation.py::_build_refine_chain_eval; role of the
reference's MISE loop, ConvONets/conv_onet/generation.py:126-142) measures
~235 ms device time at 256^3 but its cost was never split by stage. This
script builds PREFIX variants of the chain (``profile_stop``: after the
resolution0 dense decode, after each level's mask+compaction, after each
level's sparse decode+scatter, and the full band-emitting program), runs
each under the device-loop serial-chain protocol (CLAUDE.md: the only
honest timing through the axon tunnel), and prints consecutive-prefix
deltas — the per-stage device cost.

Every prefix returns a scalar reduction of all live intermediates, so XLA
cannot dead-code-eliminate a stage out of the measurement (the round-4
every-leaf lesson). Iteration i perturbs the encoder planes by iteration
i-1's output, defeating the tunnel's replay cache.

Usage (on TPU): python scripts/profile_meshgen256.py [--precision bf16]
                    [--tier 0] [--inner 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", choices=["fp32", "bf16"], default="fp32")
    ap.add_argument("--resolution0", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tier", type=int, default=0,
                    help="refine budget tier (0 = half, 1 = full)")
    ap.add_argument("--inner", type=int, default=4,
                    help="serial-chain inner iterations")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from giga_tpu.geometry.generation import MeshGenerator
    from giga_tpu.models.registry import get_network, load_params
    from giga_tpu.utils.benchmark import serial_chain_latency
    from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

    net, _ = get_network("giga_geo")
    params = load_params("checkpoints/synthetic_giga_geo.msgpack")
    gen = MeshGenerator(net, params, resolution0=args.resolution0,
                        upsampling_steps=args.steps, strategy="refine",
                        precision=args.precision)
    r = np.random.RandomState(args.seed)
    tsdf = mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r)

    mesh, st = gen.generate_mesh(tsdf)  # picks the tier, reports counts
    print("tier ran:", st.get("refine tier"), "counts:",
          st.get("refine cells (band/points-per-level)"),
          "budgets:", gen._refine_tiers[args.tier], flush=True)

    planes = gen.encode(tsdf)
    K_f, K_ps = gen._refine_tiers[args.tier]

    stops = ["dense"]
    for lvl in range(1, args.steps + 1):
        stops += [f"mask{lvl}", f"lvl{lvl}"]
    stops.append(None)

    results = []
    for stop in stops:
        chain, _ = gen._build_refine_chain_eval(K_f, K_ps, profile_stop=stop)

        def reduce_out(out):
            if isinstance(out, tuple):  # full program: every leaf live
                ids, vals, count_f, counts_p = out
                return (jnp.sum(ids).astype(jnp.float32)
                        + jnp.sum(vals.astype(jnp.float32))
                        + count_f.astype(jnp.float32)
                        + jnp.sum(counts_p).astype(jnp.float32))
            return out

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(n, p, pl, chain=chain, reduce_out=reduce_out):
            def body(i, acc):
                pl_i = {t: v + acc * 1e-30 for t, v in pl.items()}
                return acc + reduce_out(chain(p, pl_i)) * 1e-30

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        dt = serial_chain_latency(loop, (gen.params, planes),
                                  inner=args.inner)
        wall = time.perf_counter() - t0
        results.append((stop, dt))
        print(f"prefix {stop or 'full':>6}: {dt * 1e3:8.2f} ms "
              f"(measured in {wall:.0f}s)", flush=True)

    print("\nstage deltas (consecutive-prefix differencing):")
    prev = 0.0
    for stop, dt in results:
        print(f"  {stop or 'full (band emission)':>22}: "
              f"{(dt - prev) * 1e3:8.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()

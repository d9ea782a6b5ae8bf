"""A/B the batched decode implementations on the TPU (true-barrier timing).

Compares, at a given batch size and dtype, per-batch latency of:
  - XLA decode_affordance_dense_batched
  - Pallas projections kernel (decode_affordance_dense_pallas_batched)
  - Pallas raw-features kernel (…_feats_batched) over an x_chunk sweep

Each candidate runs from identical precomputed lattice features so only the
decode stage differs.  python scripts/measure_decoder_kernels.py --batch 64
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    ap.add_argument("--chunks", type=int, nargs="*", default=[4, 8, 20, 40])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--inner", type=int, default=8,
                    help="device-loop iterations per timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        lattice_coords,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.models.registry import get_network
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_batched,
        decode_affordance_dense_pallas_feats_batched,
    )
    from giga_tpu.utils.benchmark import true_latency

    B = args.batch
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40), jnp.float32)
    p0 = jnp.zeros((1, 1, 3), jnp.float32)
    params = jax.device_put(net.init(jax.random.PRNGKey(0), tsdf0, p0, p0))
    rng = np.random.RandomState(0)
    coords = lattice_coords(40)
    dp = params["params"]["decoder_aff"]

    feats_list = []
    for i in range(3):
        grids = jnp.asarray(rng.rand(B, 40, 40, 40).astype(np.float32))
        planes = net.apply(params, grids, method="encode")
        if args.dtype == "bf16":
            planes = {t: v.astype(jnp.bfloat16) for t, v in planes.items()}
        f = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
        feats_list.append(jax.device_put(jax.tree.map(jnp.asarray, f)))

    dpc = (jax.tree.map(lambda a: a.astype(jnp.bfloat16), dp)
           if args.dtype == "bf16" else dp)

    def bench(name, fn):
        """Device-loop timing: N serially-dependent kernel invocations inside
        ONE program (each iteration's input is perturbed by the previous
        iteration's output, so nothing can be deduplicated, cached, or
        overlapped), timed by wall clock around a single host fetch. Immune
        to the tunnel's dispatch floor AND its replay/result caching —
        cycling a small set of identical calls was observed to return
        physically impossible rates (0.3 ms for a 762-GFLOP batch)."""
        import time as _time

        def loop(f0, n):
            def body(i, acc):
                f = dict(f0)
                # serial dependency: invisible-at-bf16 input perturbation
                f["xz"] = f["xz"] + (acc * 1e-24).astype(f["xz"].dtype)
                # full reduce (not a single element): a 1-element slice could
                # let XLA slice-propagate and skip most of the compute
                return acc + fn(f).sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        try:
            # feats passed as ARGUMENTS: jitted closures over device arrays
            # re-ship the captured constants through the tunnel every call
            l1 = jax.jit(lambda f: loop(f, 1))
            ln = jax.jit(lambda f: loop(f, 1 + args.inner))
            np.asarray(l1(feats_list[0]))
            np.asarray(ln(feats_list[0]))  # compile both

            def t(g):
                t0 = _time.perf_counter()
                np.asarray(g(feats_list[0]))
                return _time.perf_counter() - t0

            dts = sorted(
                (t(ln) - t(l1)) / args.inner for _ in range(args.repeats)
            )
            dt = dts[len(dts) // 2]  # median
            print(f"{name:32s} {dt * 1e3:8.3f} ms/batch  "
                  f"{B / dt:8.1f} scenes/s   (runs: "
                  + ", ".join(f"{d * 1e3:.2f}" for d in dts) + ")")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}")

    bench("xla batched", lambda f: decode_affordance_dense_batched(
        dpc, f, coords)[0].astype(jnp.float32))
    bench("pallas projections", lambda f: decode_affordance_dense_pallas_batched(
        dp, f, coords, compute_dtype=cdt)[0])
    for cx in args.chunks:
        bench(f"pallas raw-feats x_chunk={cx}",
              lambda f, cx=cx: decode_affordance_dense_pallas_feats_batched(
                  dp, f, coords, compute_dtype=cdt, x_chunk=cx)[0])


if __name__ == "__main__":
    main()

"""Decompose the 256^3 device-refine meshgen cost (VERDICT r3 #3).

BENCH_r03 measured 503 ms/scene while the round-3 measurement script
claimed ~350 fp32 / ~300 bf16 — this script splits one warm
``generate_mesh`` call into its real stages so claim and artifact converge:

    encode      jitted encoder dispatch + (async) return
    refine      tiered device refine program + host fetch of the band
    triangulate _mesh_from_band: sparse marching tets + TriMesh build

Also reports which tier ran, band/point counts vs budgets, and the band
fetch size. Run on the TPU: python scripts/diagnose_meshgen256.py
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
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    from giga_tpu.geometry.generation import MeshGenerator
    from giga_tpu.models.registry import get_network, load_params
    from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

    geo_net, _ = get_network("giga_geo")
    geo_params = load_params("checkpoints/synthetic_giga_geo.msgpack")
    gen = MeshGenerator(geo_net, geo_params, resolution0=args.resolution0,
                        upsampling_steps=args.steps, strategy="refine",
                        precision=args.precision)
    r = np.random.RandomState(0)
    tsdf = mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r)

    mesh, st = gen.generate_mesh(tsdf)  # compile + tier report
    print("tier:", st.get("refine tier"), "bands:",
          st.get("refine cells (band/points-per-level)"),
          "budgets:", gen._refine_tiers, flush=True)
    print("faces:", len(mesh.faces))

    logit_th = float(np.log(gen.threshold) - np.log(1 - gen.threshold))
    box_size = 1.0 + gen.padding
    tier = int(st.get("refine tier", 0))
    fn = gen._refine_band_fn(tier)

    for rep in range(args.repeats):
        t0 = time.perf_counter()
        planes = gen.encode(tsdf)
        t_enc_dispatch = time.perf_counter() - t0

        t0 = time.perf_counter()
        ids, vals, count_f, counts_p = jax.device_get(fn(gen.params, planes))
        t_refine = time.perf_counter() - t0
        cf = int(count_f)

        t0 = time.perf_counter()
        m = gen._mesh_from_band(ids[:cf], vals[:cf], logit_th, box_size, {})
        t_tri = time.perf_counter() - t0

        fetch_mb = (ids.nbytes + vals.nbytes) / 1e6
        total = t_enc_dispatch + t_refine + t_tri
        print(
            f"rep {rep}: encode-dispatch {t_enc_dispatch * 1e3:7.1f} ms | "
            f"refine+fetch {t_refine * 1e3:7.1f} ms ({fetch_mb:.2f} MB band) | "
            f"triangulate {t_tri * 1e3:7.1f} ms ({cf} cells, "
            f"{len(m.faces)} faces) | total {total * 1e3:7.1f} ms",
            flush=True,
        )

    # whole-call wall clock for comparison with bench.py's number
    ts = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        gen.generate_mesh(tsdf, return_stats=False)
        ts.append(time.perf_counter() - t0)
    print(f"generate_mesh warm median: {np.median(ts) * 1e3:.1f} ms "
          f"(bench.py protocol)")


if __name__ == "__main__":
    main()

"""Measure mesh-generation strategies on the live device.

Times the dense-band path and the device MISE chain (strategy="refine") at
128^3 and 256^3, fp32 and bf16, on warm programs. Wall-clock medians over
full generate_mesh calls (host triangulation included) — the honest number
a user of the reconstruction path sees.

Usage: python scripts/measure_meshgen.py [--scenes 3] [--reps 3]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(gen, tsdfs, reps):
    gen.generate_mesh(tsdfs[0], return_stats=False)  # compile
    ts = []
    info = None
    for tsdf in tsdfs:
        for _ in range(reps):
            t0 = time.perf_counter()
            m, st = gen.generate_mesh(tsdf)
            ts.append(time.perf_counter() - t0)
            info = (len(m.faces), st.get("refine tier"),
                    st.get("refine cells (band/points-per-level)"))
    return float(np.median(ts)), info


def main(args):
    from giga_tpu.geometry.generation import MeshGenerator
    from giga_tpu.models.registry import get_network, load_params
    from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

    net, _ = get_network("giga_geo")
    params = load_params("checkpoints/synthetic_giga_geo.msgpack")
    r = np.random.RandomState(0)
    tsdfs = []
    for _ in range(args.scenes):
        tsdfs.append(mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r))

    rows = []
    for res0, steps, label in ((32, 2, "128^3"), (32, 3, "256^3")):
        for strategy in ("dense", "refine"):
            if strategy == "dense" and label == "256^3" and not args.dense256:
                continue  # 17M-row decode; only measure when asked
            for precision in ("fp32", "bf16"):
                gen = MeshGenerator(net, params, resolution0=res0,
                                    upsampling_steps=steps, strategy=strategy,
                                    precision=precision)
                med, info = measure(gen, tsdfs, args.reps)
                rows.append((label, strategy, precision, med * 1e3, info))
                print(f"{label} {strategy} {precision}: {med * 1e3:.0f} ms/scene"
                      f" (faces/tier/bands {info})", flush=True)
    print("\nsummary:")
    for label, strategy, precision, ms, _ in rows:
        print(f"  {label:6s} {strategy:6s} {precision}: {ms:7.1f} ms/scene")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dense256", action="store_true",
                   help="also time the full dense decode at 256^3")
    raise SystemExit(main(p.parse_args()))

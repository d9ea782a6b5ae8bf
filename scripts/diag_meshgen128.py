"""Diagnose the 128^3 meshgen 112 -> 148 ms/scene move between rounds 3 and 4.

Hypothesis (from git history): commit 861aac0 seeded the bench scene's
surface sampling (`mesh_to_tsdf(..., rng=r)`), so the r3 and r4 benches
timed DIFFERENT TSDF inputs — a scene-complexity change, not a code
regression. This script measures (a) the exact r4-bench scene with many
repeats plus its stage breakdown, and (b) per-scene medians across several
seeds, to show where 112 and 148 sit inside the cross-scene spread.

Usage: python scripts/diag_meshgen128.py [--reps 9] [--scenes 6]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure_scene(gen, tsdf, reps):
    ts, stats = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        _, stats = gen.generate_mesh(tsdf)
        ts.append(time.perf_counter() - t0)
    return np.asarray(ts), stats


def main(args):
    from giga_tpu.geometry.generation import MeshGenerator
    from giga_tpu.models.registry import get_network, load_params
    from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

    net, _ = get_network("giga_geo")
    params = load_params("checkpoints/synthetic_giga_geo.msgpack")
    gen = MeshGenerator(net, params, resolution0=32, upsampling_steps=2)

    # (a) the exact r4-bench scene: RandomState(0) drives both scene AND
    # surface sampling, matching bench.py section_meshgen post-861aac0
    r = np.random.RandomState(0)
    tsdf_r4 = mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r)
    gen.generate_mesh(tsdf_r4, return_stats=False)  # compile
    ts, stats = measure_scene(gen, tsdf_r4, args.reps)
    med = float(np.median(ts))
    print(f"r4-bench scene: median {med * 1e3:.1f} ms over {args.reps} reps, "
          f"spread [{ts.min() * 1e3:.1f}, {ts.max() * 1e3:.1f}]")
    for k, v in stats.items():
        if k.startswith("time"):
            print(f"  {k}: {v * 1e3:.1f} ms")

    # (b) cross-scene spread: same generator, different seeds
    print(f"\nper-scene medians ({args.scenes} scenes x {args.reps} reps):")
    meds = []
    for seed in range(args.scenes):
        rs = np.random.RandomState(seed)
        tsdf = mesh_to_tsdf(random_scene(rs, 0.3), 0.3, 40, rng=rs)
        ts, stats = measure_scene(gen, tsdf, args.reps)
        m = float(np.median(ts))
        meds.append(m)
        mc = stats.get("time (marching cubes)", 0.0)
        ev = stats.get("time (eval points)", 0.0)
        print(f"  seed {seed}: {m * 1e3:.1f} ms "
              f"(eval {ev * 1e3:.0f} / marching {mc * 1e3:.0f})")
    meds = np.asarray(meds)
    print(f"\ncross-scene: mean {meds.mean() * 1e3:.1f} ms, "
          f"std {meds.std() * 1e3:.1f}, "
          f"range [{meds.min() * 1e3:.1f}, {meds.max() * 1e3:.1f}]")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--scenes", type=int, default=6)
    main(ap.parse_args())

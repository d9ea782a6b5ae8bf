"""Build a sharded synthetic grasp corpus (scenes + occupancy + oracle labels).

The environment-local analog of the reference's data pipeline
(scripts/generate_data_parallel.py -> clean_balance -> construct_dataset ->
save_occ_data): one pass produces, per scene, the ideal TSDF, pre-sampled
occupancy points/labels, and oracle-labeled grasp candidates, sharded to
data/corpus/shard_NNN.npz. Class balancing happens at sample time
(train/corpus.py CorpusSampler), so no rebalanced copy is materialized.

Resumable: existing complete shards are skipped, so an interrupted build
continues where it left off.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.train.corpus import build_scene, write_shard


def main(args):
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    n_shards = (args.n_scenes + args.shard_size - 1) // args.shard_size
    t0 = time.time()
    built = 0
    for shard in range(n_shards):
        # tag keeps shards from different seed ranges distinct so several
        # ranges can share one corpus dir (load_corpus globs shard_*.npz)
        path = out / f"shard_{args.tag}{shard:03d}.npz"
        lo = shard * args.shard_size
        hi = min(lo + args.shard_size, args.n_scenes)
        if path.exists():
            print(f"{path} exists, skipping", flush=True)
            continue
        # per-scene seeding keeps shards independent of build order
        scenes = [
            build_scene(np.random.RandomState(args.seed + i), args.size,
                        args.n_occ, args.n_grasps)
            for i in range(lo, hi)
        ]
        write_shard(path, scenes)
        built += len(scenes)
        frac = np.mean([s["grasp_label"].mean() for s in scenes])
        print(f"{path}: {hi - lo} scenes, positive fraction {frac:.2f}, "
              f"{(time.time() - t0) / max(built, 1):.2f} s/scene", flush=True)
    print(f"corpus complete: {args.n_scenes} scenes in {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-scenes", type=int, default=480)
    p.add_argument("--n-grasps", type=int, default=160)
    p.add_argument("--n-occ", type=int, default=8192)
    p.add_argument("--shard-size", type=int, default=60)
    p.add_argument("--size", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tag", type=str, default="",
                   help="shard filename tag (shard_<tag>NNN.npz)")
    p.add_argument("--out", type=str, default="data/corpus")
    raise SystemExit(main(p.parse_args()))

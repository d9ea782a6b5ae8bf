"""Run single rounds and save per-step world snapshots for offline rendering
(reference: scripts/sim_grasp_save_scene.py)."""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.experiments import clutter_removal_single
from giga_tpu.inference.planner import GIGAPlanner, VGNPlanner
from giga_tpu.sim.noise import set_random_seed


def main(args):
    if "giga" in args.type:
        planner = GIGAPlanner(
            args.model, args.type, best=args.best, qual_th=args.qual_th,
            force_detection=args.force, out_th=args.out_th, resolution=args.res,
        )
    elif args.type == "vgn":
        planner = VGNPlanner(
            args.model, args.type, best=args.best, qual_th=args.qual_th,
            force_detection=args.force, out_th=args.out_th,
        )
    else:
        raise NotImplementedError(f"model type {args.type} not implemented")

    set_random_seed(args.seed)
    results = {}
    for n in range(args.num_rounds):
        seed = int(np.random.randint(3000))
        save_dir = args.save_dir / f"round_{n:03d}"
        results[n] = clutter_removal_single.run(
            grasp_plan_fn=planner, save_dir=save_dir, scene=args.scene,
            object_set=args.object_set, num_objects=args.num_objects,
            n=args.num_view, seed=seed, sim_gui=args.sim_gui,
            add_noise=args.add_noise, sideview=args.sideview,
        )
        print(f"Round {n} finished, result: {results[n]}")
    with open(args.save_dir / "results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=Path, required=True)
    parser.add_argument("--type", type=str, required=True)
    parser.add_argument("--save-dir", type=Path, required=True)
    parser.add_argument("--scene", type=str, choices=["pile", "packed"], default="pile")
    parser.add_argument("--object-set", type=str, default="blocks")
    parser.add_argument("--num-objects", type=int, default=5)
    parser.add_argument("--num-view", type=int, default=1)
    parser.add_argument("--num-rounds", type=int, default=10)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--sim-gui", action="store_true")
    parser.add_argument("--qual-th", type=float, default=0.9)
    parser.add_argument("--out-th", type=float, default=0.5)
    parser.add_argument("--res", type=int, default=40)
    parser.add_argument("--best", action="store_true")
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--add-noise", type=str, default="")
    parser.add_argument("--sideview", action="store_true")
    main(parser.parse_args())

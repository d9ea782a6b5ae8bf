"""Multi-seed clutter-removal benchmark CLI
(reference: scripts/sim_grasp_multiple.py).

Dispatches giga/giga_aff -> GIGAPlanner, vgn -> VGNPlanner, runs the
benchmark for each seed and writes mean +- std GSR/DR to JSON.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.experiments import clutter_removal
from giga_tpu.inference.planner import GIGAPlanner, VGNPlanner
from giga_tpu.sim.noise import set_random_seed


def main(args):
    if args.type in ("giga", "giga_aff", "giga_detach"):
        planner = GIGAPlanner(
            args.model, args.type, best=args.best, qual_th=args.qual_th,
            force_detection=args.force, out_th=0.1, visualize=args.vis,
        )
    elif args.type == "vgn":
        planner = VGNPlanner(
            args.model, args.type, best=args.best, qual_th=args.qual_th,
            force_detection=args.force, out_th=0.1, visualize=args.vis,
        )
    else:
        raise NotImplementedError(f"model type {args.type} not implemented")

    gsr, dr = [], []
    for seed in args.seeds:
        set_random_seed(seed)
        success_rate, declutter_rate = clutter_removal.run(
            grasp_plan_fn=planner,
            logdir=args.logdir,
            description=args.description,
            scene=args.scene,
            object_set=args.object_set,
            num_objects=args.num_objects,
            n=args.num_view,
            num_rounds=args.num_rounds,
            seed=seed,
            sim_gui=args.sim_gui,
            add_noise=args.add_noise,
            sideview=args.sideview,
            silence=args.silence,
            visualize=args.vis,
        )
        gsr.append(success_rate)
        dr.append(declutter_rate)

    results = {
        "gsr": {"mean": float(np.mean(gsr)), "std": float(np.std(gsr)), "val": gsr},
        "dr": {"mean": float(np.mean(dr)), "std": float(np.std(dr)), "val": dr},
    }
    print("Average results:")
    print(f"Grasp success rate: {np.mean(gsr):.2f} +- {np.std(gsr):.2f} %")
    print(f"Declutter rate: {np.mean(dr):.2f} +- {np.std(dr):.2f} %")
    if args.result_path:
        with open(args.result_path, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=Path, required=True)
    parser.add_argument("--type", type=str, required=True)
    parser.add_argument("--logdir", type=Path, default=Path("data/experiments"))
    parser.add_argument("--description", type=str, default="")
    parser.add_argument("--scene", type=str, choices=["pile", "packed"], default="pile")
    parser.add_argument("--object-set", type=str, default="blocks")
    parser.add_argument("--num-objects", type=int, default=5)
    parser.add_argument("--num-view", type=int, default=1)
    parser.add_argument("--num-rounds", type=int, default=100)
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    parser.add_argument("--sim-gui", action="store_true")
    parser.add_argument("--qual-th", type=float, default=0.9)
    parser.add_argument("--best", action="store_true")
    parser.add_argument("--result-path", type=str)
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--add-noise", type=str, default="")
    parser.add_argument("--sideview", action="store_true")
    parser.add_argument("--silence", action="store_true")
    parser.add_argument("--vis", action="store_true")
    main(parser.parse_args())

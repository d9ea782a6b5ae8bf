"""Multi-seed clutter-removal benchmark CLI
(protocol of reference scripts/sim_grasp_multiple.py: 100 rounds x 5 objects
per seed, seeds {0..4}, GSR/DR aggregated mean +- std to JSON).

Dispatch: giga / giga_aff / giga_detach -> GIGAPlanner, vgn -> VGNPlanner.
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

FLAGS = [
    # (name, kwargs)
    ("--model", dict(type=Path, required=True)),
    ("--type", dict(type=str, required=True)),
    ("--logdir", dict(type=Path, default=Path("data/experiments"))),
    ("--description", dict(type=str, default="")),
    ("--scene", dict(type=str, choices=["pile", "packed"], default="pile")),
    ("--object-set", dict(type=str, default="blocks")),
    ("--num-objects", dict(type=int, default=5)),
    ("--num-view", dict(type=int, default=1)),
    ("--num-rounds", dict(type=int, default=100)),
    ("--seeds", dict(type=int, nargs="+", default=[0, 1, 2, 3, 4])),
    ("--qual-th", dict(type=float, default=0.9)),
    ("--result-path", dict(type=str)),
    ("--add-noise", dict(type=str, default="")),
    ("--sim-gui", dict(action="store_true")),
    ("--best", dict(action="store_true", help="take the best grasp instead of a random valid one")),
    ("--force", dict(action="store_true", help="fall back to the best sub-threshold grasp")),
    ("--sideview", dict(action="store_true")),
    ("--silence", dict(action="store_true")),
    ("--vis", dict(action="store_true")),
]


def build_planner(args):
    common = dict(
        best=args.best, qual_th=args.qual_th, force_detection=args.force,
        out_th=0.1, visualize=args.vis,
    )
    if args.type in ("giga", "giga_aff", "giga_detach"):
        return GIGAPlanner(args.model, args.type, **common)
    if args.type == "vgn":
        return VGNPlanner(args.model, args.type, **common)
    raise NotImplementedError(f"model type {args.type!r} not implemented")


def main(args):
    planner = build_planner(args)
    per_seed = {"gsr": [], "dr": []}
    for seed in args.seeds:
        set_random_seed(seed)
        gsr, dr = clutter_removal.run(
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
        per_seed["gsr"].append(gsr)
        per_seed["dr"].append(dr)

    summary = {
        k: {"mean": float(np.mean(v)), "std": float(np.std(v)), "val": v}
        for k, v in per_seed.items()
    }
    print("Average results:")
    print(f"Grasp success rate: {summary['gsr']['mean']:.2f} +- {summary['gsr']['std']:.2f} %")
    print(f"Declutter rate: {summary['dr']['mean']:.2f} +- {summary['dr']['std']:.2f} %")
    if args.result_path:
        Path(args.result_path).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    for name, kwargs in FLAGS:
        parser.add_argument(name, **kwargs)
    main(parser.parse_args())

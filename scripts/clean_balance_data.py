"""Clean + balance a raw grasp dataset (reference: scripts/clean_balance_data.py).

Drops grasps outside the workspace margin, downsamples negatives to match the
positive count, and deletes scene files no longer referenced by any grasp.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.core import io


def summarize(df, title):
    pos = (df["label"] == 1).sum()
    print(f"{title}: samples={len(df.index)} positives={pos} negatives={len(df.index) - pos}")


def main(args):
    df = io.read_df(args.root)
    summarize(df, "Before clean and balance")

    # clean: workspace margin [0.02, 0.28] on every axis
    for axis in ("x", "y", "z"):
        df = df[(df[axis] >= 0.02) & (df[axis] <= 0.28)]

    # balance: drop random negatives down to the positive count
    positives = df[df["label"] == 1]
    negatives = df[df["label"] == 0]
    surplus = len(negatives.index) - len(positives.index)
    if surplus > 0:
        drop = np.random.choice(negatives.index, surplus, replace=False)
        df = df.drop(drop)
    io.write_df(df, args.root)

    # remove unreferenced scene files
    scenes = set(df["scene_id"].values)
    for f in (args.root / "scenes").iterdir():
        if f.suffix == ".npz" and f.stem not in scenes:
            print("Removed", f)
            f.unlink()

    summarize(io.read_df(args.root), "After clean and balance")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("root", type=Path)
    main(parser.parse_args())

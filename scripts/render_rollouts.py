"""Render saved rollout snapshots with NViSII
(reference: scripts/render_rollouts_nvisii.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.utils.nvisii_render import NViSIIRenderer


def main(args):
    renderer = NViSIIRenderer(spp=args.spp)
    for round_dir in sorted(args.rollout_dir.glob("round_*")):
        renderer.render_rollout(round_dir, args.out_dir / round_dir.name)
    renderer.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("rollout_dir", type=Path)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--spp", type=int, default=64)
    main(parser.parse_args())

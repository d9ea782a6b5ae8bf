"""Render saved rollout snapshots to PNG frames
(reference: scripts/render_rollouts_nvisii.py).

Uses the NViSII path tracer when installed; otherwise falls back to the
native software rasterizer (giga_tpu/utils/render.py) so rollouts render
anywhere.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_renderer(args):
    from giga_tpu.utils.nvisii_render import NVISII_AVAILABLE

    if NVISII_AVAILABLE and not args.software:
        from giga_tpu.utils.nvisii_render import NViSIIRenderer

        return NViSIIRenderer(spp=args.spp)
    from giga_tpu.utils.render import SoftwareRenderer

    return SoftwareRenderer()


def main(args):
    renderer = make_renderer(args)
    for round_dir in sorted(args.rollout_dir.glob("round_*")):
        renderer.render_rollout(round_dir, args.out_dir / round_dir.name)
    renderer.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("rollout_dir", type=Path)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--spp", type=int, default=64)
    parser.add_argument("--software", action="store_true",
                        help="force the software rasterizer")
    main(parser.parse_args())

"""Model-quality regression gate for the shipped GIGA-Geo checkpoint:
reconstruction on held-out synthetic scenes must keep a minimum IoU/F-score.

The geometry analog of tests/test_gsr_gate.py (the reference validates
reconstruction only through eval_meshes.py runs on pre-generated datasets;
this gate is the self-contained equivalent): build TSDFs of fresh seeded
scenes, reconstruct with geometry/generation.MeshGenerator (device MISE),
score with geometry/eval.MeshEvaluator against the ground-truth mesh.

Shipped round-4 checkpoint (8,192-scene corpus, occ-accuracy selection)
measured IoU 0.836 / F-score 0.861 / Chamfer-L1 0.0054 on the 16-scene TPU
protocol (resolution0=32, 2 upsampling steps). This CPU gate runs 4 scenes
at one upsampling step (65^3 final lattice, ~7 s): shipped measures
IoU 0.875 / F 0.868 / C-L1 0.0057, while the round-2 checkpoint measures
0.766 / 0.651 / 0.0096 — every floor separates them by a wide margin.
"""

import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
CHECKPOINT = ROOT / "checkpoints" / "synthetic_giga_geo.msgpack"

IOU_FLOOR = 0.82
FSCORE_FLOOR = 0.78
CHAMFER_L1_CEIL = 0.0075  # normalized units ([-0.5, 0.5]^3 frame)


@pytest.mark.skipif(not CHECKPOINT.exists(), reason="shipped checkpoint missing")
def test_shipped_geo_checkpoint_reconstruction():
    sys.path.insert(0, str(ROOT / "scripts"))
    from eval_synthetic_geometry import evaluate_geo_checkpoint

    out = evaluate_geo_checkpoint(
        str(CHECKPOINT), n_scenes=4, seed=2000,
        resolution0=32, upsampling_steps=1, n_eval_points=50000,
    )
    assert out["iou"] >= IOU_FLOOR, out
    assert out["f-score"] >= FSCORE_FLOOR, out
    assert out["chamfer-L1"] <= CHAMFER_L1_CEIL, out

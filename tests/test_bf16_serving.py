"""bf16 serving guardrail (VERDICT item 10).

The bf16-trunk planner must make grasp decisions as good as fp32's on a
synthetic corpus with the shipped checkpoint. Strict set-identity is not
achievable: bf16 shifts qualities by ~1e-3, which flips voxels sitting
exactly on the 0.8 threshold and reorders NMS peaks whose scores tie to
<1e-3 — measured on this corpus, that is 0-3 of ~12 candidates per scene,
always at equal quality. So the guardrail pins what deployment cares about:

  1. the executed (top-1) grasp scores within 5e-3 of fp32's top-1 — the
     bf16 choice is never a worse grasp;
  2. the top-1 voxel is literally identical on most scenes;
  3. the candidate sets overlap strongly;
  4. per-grasp scores drift at most 0.02.
"""

import numpy as np
import pytest

from giga_tpu.inference.planner import GIGAPlanner, State
from giga_tpu.models.registry import get_network, load_params
from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

N_SCENES = 16
VOXEL = 0.3 / 40


@pytest.fixture(scope="module")
def results():
    net, cfg = get_network("giga")
    params = load_params("checkpoints/synthetic_giga_best.msgpack")
    kw = dict(net=net, model_cfg=cfg, params=params, best=True,
              force_detection=True, low_th=0.1, qual_th=0.8)
    fp32 = GIGAPlanner(rng=np.random.RandomState(0), **kw)
    bf16 = GIGAPlanner(rng=np.random.RandomState(0), precision="bf16", **kw)
    rng = np.random.RandomState(7)
    out = []
    for _ in range(N_SCENES):
        # rng passed through: mesh_to_tsdf falls back to GLOBAL numpy
        # randomness otherwise, making the fixture order-dependent
        tsdf = mesh_to_tsdf(random_scene(rng, 0.3), 0.3, 40, rng=rng)[None]
        out.append((fp32(State(tsdf=tsdf)), bf16(State(tsdf=tsdf))))
    return out


def _voxels(grasps):
    return [tuple(np.round(g.pose.translation / VOXEL).astype(int)) for g in grasps]


def test_corpus_non_degenerate(results):
    # the round-4 checkpoint is more selective than round 3's (one fixture
    # scene yields 4 candidates, counts 4-22); the ensemble must stay large
    assert all(len(r32[0]) >= 3 for r32, _ in results)
    assert sum(len(r32[0]) for r32, _ in results) >= 8 * N_SCENES


def test_top1_equally_good(results):
    for (g32, s32, _), (g16, s16, _) in results:
        assert abs(s16[0] - s32[0]) <= 5e-3


def test_top1_mostly_identical(results):
    exact = sum(
        _voxels(g32[:1]) == _voxels(g16[:1])
        for (g32, _, _), (g16, _, _) in results
    )
    assert exact >= int(0.6 * N_SCENES), f"top-1 voxel identical on only {exact}/{N_SCENES}"


def test_candidate_sets_overlap(results):
    """Strong overlap on average, never collapse on any scene. (Per-scene
    counts are ~10-14, so one threshold-straddling voxel moves a scene's
    overlap by ~0.1 — a hard 0.7 per-scene floor flaked with CPU backend
    reduction-order changes. The round-3 corpus checkpoint proposes ~40%
    more candidates, with proportionally more sitting within bf16 rounding
    of qual_th; the DECISION-level guarantees are the top-1 and score
    tests above, this one only guards against ensemble collapse.)"""
    overlaps = []
    for (g32, _, _), (g16, _, _) in results:
        a, b = set(_voxels(g32)), set(_voxels(g16))
        overlaps.append(len(a & b) / max(len(a), len(b)))
    assert min(overlaps) >= 0.5, f"candidate overlap collapsed: {min(overlaps):.2f}"
    assert np.mean(overlaps) >= 0.65, f"mean candidate overlap {np.mean(overlaps):.2f}"


def test_scores_close(results):
    for (g32, s32, _), (g16, s16, _) in results:
        a, b = _voxels(g32), _voxels(g16)
        s_by_vox32 = dict(zip(a, s32))
        for vox, s in zip(b, s16):
            if vox in s_by_vox32:
                assert abs(s - s_by_vox32[vox]) <= 0.02

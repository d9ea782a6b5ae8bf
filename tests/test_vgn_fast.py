"""VGN fast-trunk guardrail (round-4 VERDICT #2).

build_vgn_planner_fn dropped the blanket fp32-highest pin: the conv trunk
now runs at the backend's default matmul pass (bf16-multiply/fp32-accumulate
on TPU; measured 54.8 -> ~2 ms per scene) while postprocess stays fp32.
These tests pin that grasp DECISIONS survive the precision drop: the
default-precision plan is traced under an explicit bfloat16 matmul context
(emulating the TPU default pass on the CPU test backend, where conftest
pins 'highest' globally) and compared against the exact highest-precision
plan. Mirrors tests/test_bf16_serving.py's decision-level contract.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from giga_tpu.core.config import PlannerConfig
from giga_tpu.inference.planner import build_vgn_planner_fn
from giga_tpu.models.registry import get_network
from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

N_SCENES = 8


def _candidates(plan, params, grids):
    out = []
    for g in grids:
        cands, _ = jax.device_get(plan(params, jnp.asarray(g), jnp.asarray(g)))
        n = int(cands.count)
        order = np.argsort(-np.asarray(cands.scores[:n]), kind="stable")
        out.append((
            [tuple(np.round(np.asarray(cands.positions[i])).astype(int)) for i in order],
            np.asarray(cands.scores)[order],
        ))
    return out


@pytest.fixture(scope="module")
def results():
    net, _ = get_network("vgn")
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 40, 40, 40), jnp.float32))
    # bias the qual head up so the random-init net clears the threshold on
    # a real surface band (same trick as __graft_entry__'s sp validation)
    params = jax.device_get(params)
    params["params"]["conv_qual"]["conv"]["bias"] = (
        params["params"]["conv_qual"]["conv"]["bias"] + 2.0
    )
    # width head must land inside the VGN voxel-unit window [1.33, 9.33]
    # (detection.py:116-118) or the mask rejects every voxel
    params["params"]["conv_width"]["conv"]["bias"] = (
        params["params"]["conv_width"]["conv"]["bias"] + 5.0
    )
    pcfg = PlannerConfig(qual_th=0.85, low_th=0.5, force_detection=True)
    rng = np.random.RandomState(11)
    grids = [mesh_to_tsdf(random_scene(rng, 0.3), 0.3, 40, rng=rng)
             for _ in range(N_SCENES)]

    exact = build_vgn_planner_fn(net, pcfg, 0.3, precision="highest")
    res_hi = _candidates(exact, params, grids)

    fast = build_vgn_planner_fn(net, pcfg, 0.3)
    with jax.default_matmul_precision("bfloat16"):
        res_fast = _candidates(fast, params, grids)
    return list(zip(res_hi, res_fast))


def test_non_degenerate(results):
    assert all(len(hi[0]) >= 3 for hi, _ in results), [len(hi[0]) for hi, _ in results]


def test_top1_equally_good(results):
    for (_, s_hi), (_, s_fa) in results:
        assert abs(float(s_fa[0]) - float(s_hi[0])) <= 5e-3


def test_top1_mostly_identical(results):
    exact = sum(hi[0][:1] == fa[0][:1] for hi, fa in results)
    assert exact >= int(0.6 * N_SCENES), f"top-1 voxel identical on only {exact}/{N_SCENES}"


def test_candidate_sets_overlap(results):
    overlaps = []
    for (v_hi, _), (v_fa, _) in results:
        a, b = set(v_hi), set(v_fa)
        overlaps.append(len(a & b) / max(len(a), len(b)))
    assert min(overlaps) >= 0.5, f"candidate overlap collapsed: {min(overlaps):.2f}"
    assert np.mean(overlaps) >= 0.7, f"mean candidate overlap {np.mean(overlaps):.2f}"


def test_scores_close(results):
    for (v_hi, s_hi), (v_fa, s_fa) in results:
        by_vox = dict(zip(v_hi, s_hi))
        for vox, s in zip(v_fa, s_fa):
            if vox in by_vox:
                assert abs(float(s) - float(by_vox[vox])) <= 0.02


def test_plan_batch_matches_single():
    """build_batched_vgn_planner_fn == per-scene build_vgn_planner_fn: the
    batched serving program must reproduce each scene's candidates exactly
    (same precision context, batched stencils/top-K vs single)."""
    from giga_tpu.inference.planner import build_batched_vgn_planner_fn

    net, _ = get_network("vgn")
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 40, 40, 40), jnp.float32))
    params = jax.device_get(params)
    params["params"]["conv_qual"]["conv"]["bias"] = (
        params["params"]["conv_qual"]["conv"]["bias"] + 2.0
    )
    params["params"]["conv_width"]["conv"]["bias"] = (
        params["params"]["conv_width"]["conv"]["bias"] + 5.0
    )
    pcfg = PlannerConfig(qual_th=0.85, low_th=0.5, force_detection=True)
    rng = np.random.RandomState(4)
    grids = np.stack([mesh_to_tsdf(random_scene(rng, 0.3), 0.3, 40, rng=rng)
                      for _ in range(3)]).astype(np.float32)

    single = build_vgn_planner_fn(net, pcfg, 0.3, precision="highest")
    batched = build_batched_vgn_planner_fn(net, pcfg, 0.3, precision="highest")
    cands_b = jax.device_get(batched(params, jnp.asarray(grids),
                                     jnp.asarray(grids)))
    for i, g in enumerate(grids):
        cands, _ = jax.device_get(single(params, jnp.asarray(g), jnp.asarray(g)))
        n = int(cands.count)
        assert int(cands_b.count[i]) == n and n >= 1
        np.testing.assert_allclose(np.asarray(cands_b.scores[i][:n]),
                                   np.asarray(cands.scores[:n]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(cands_b.positions[i][:n]),
                                      np.asarray(cands.positions[:n]))
        np.testing.assert_allclose(np.asarray(cands_b.rotations[i][:n]),
                                   np.asarray(cands.rotations[:n]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cands_b.widths[i][:n]),
                                   np.asarray(cands.widths[:n]), atol=1e-6)

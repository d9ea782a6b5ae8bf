"""Planner tests: dense-decode factorization parity + postprocess golden vs
a scipy reimplementation of the reference pipeline."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from giga_tpu.core.config import PlannerConfig
from giga_tpu.inference.dense_decode import (
    decode_affordance_dense,
    lattice_coords,
    sample_planes_on_lattice,
)
from giga_tpu.inference.planner import GIGAPlanner, State
from giga_tpu.inference.postprocess import bound_quality, mask_quality, select_grasps
from giga_tpu.models.registry import get_network


@pytest.fixture(scope="module")
def giga_net_params():
    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf, p, p)
    return net, cfg, params


class TestDenseDecode:
    def test_factorized_decode_matches_pointwise(self, giga_net_params):
        net, cfg, params = giga_net_params
        rng = np.random.RandomState(0)
        tsdf = jnp.asarray(rng.rand(1, 40, 40, 40).astype(np.float32))
        planes_b = net.apply(params, tsdf, method="encode")
        planes = {t: v[0] for t, v in planes_b.items()}

        coords = lattice_coords(40)
        feats = sample_planes_on_lattice(planes, coords, 40, 0.0)
        qual_d, rot_d, width_d = decode_affordance_dense(
            params["params"]["decoder_aff"], feats, coords
        )

        # gather-path module apply on the same lattice
        x, y, z = jnp.meshgrid(coords, coords, coords, indexing="ij")
        p = jnp.stack([x, y, z], axis=-1).reshape(1, -1, 3)
        qual_g, rot_g, width_g = net.apply(
            params, planes_b, p, method="decode_affordance"
        )
        np.testing.assert_allclose(
            np.asarray(qual_d).ravel(), np.asarray(qual_g)[0], atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(rot_d).reshape(-1, 4), np.asarray(rot_g)[0], atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(width_d).ravel(), np.asarray(width_g)[0], atol=2e-5
        )


def reference_postprocess(tsdf, qual, rot, width, cfg: PlannerConfig, voxel_size):
    """scipy/numpy reimplementation of the reference process+bound+select."""
    qual = ndi.gaussian_filter(qual, sigma=cfg.gaussian_sigma, mode="nearest")
    outside = tsdf > cfg.out_th
    inside = np.logical_and(1e-3 < tsdf, tsdf < cfg.out_th)
    valid = ndi.binary_dilation(outside, iterations=2, mask=np.logical_not(inside))
    qual = qual.copy()
    qual[valid == False] = 0.0  # noqa: E712
    qual[np.logical_or(width < cfg.min_width, width > cfg.max_width)] = 0.0
    # bound
    lx = int(cfg.bound_limits[0] / voxel_size)
    lz = int(cfg.bound_limits[2] / voxel_size)
    qual[:lx] = 0.0
    qual[-lx:] = 0.0
    qual[:, :lx] = 0.0
    qual[:, -lx:] = 0.0
    qual[:, :, :lz] = 0.0
    # select
    qual[qual < cfg.low_th] = 0.0
    best_only = False
    if cfg.force_detection and (qual >= cfg.qual_th).sum() == 0:
        best_only = True
    else:
        qual[qual < cfg.qual_th] = 0.0
    max_vol = ndi.maximum_filter(qual, size=cfg.max_filter_size)
    qual = np.where(qual == max_vol, qual, 0.0)
    mask = np.where(qual, 1.0, 0.0)
    idxs = np.argwhere(mask)
    scores = [qual[tuple(i)] for i in idxs]
    order = list(reversed(np.argsort(scores)))
    out = [(tuple(idxs[i]), scores[i]) for i in order]
    if best_only and out:
        out = out[:1]
    return out


class TestGridVariantPlanner:
    def test_dense_grid_decode_matches_gather(self):
        """giga_grid: the planner's trilinear lattice decode equals the
        module's gather-path decode_affordance."""
        net, cfg = get_network("giga_grid")
        tsdf = jnp.zeros((1, 40, 40, 40))
        p = jnp.zeros((1, 4, 3))
        params = net.init(jax.random.PRNGKey(0), tsdf, p, p)

        from giga_tpu.inference.planner import _lattice_features

        rng = np.random.RandomState(1)
        grid = jnp.asarray(rng.rand(1, 40, 40, 40).astype(np.float32))
        planes = net.apply(params, grid, method="encode")
        coords = lattice_coords(40)
        x, y, z = jnp.meshgrid(coords, coords, coords, indexing="ij")
        pts = jnp.stack([x, y, z], -1).reshape(1, -1, 3)
        qual_g, rot_g, width_g = net.apply(params, planes, pts, method="decode_affordance")

        feats = _lattice_features({t: v[0] for t, v in planes.items()}, coords, cfg)
        qd, rd, wd = decode_affordance_dense(params["params"]["decoder_aff"], feats, coords)
        np.testing.assert_allclose(np.asarray(qd).ravel(), np.asarray(qual_g)[0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(rd).reshape(-1, 4), np.asarray(rot_g)[0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(wd).ravel(), np.asarray(width_g)[0], atol=2e-5)

    def test_grid_planner_end_to_end(self):
        net, cfg = get_network("giga_grid")
        tsdf = jnp.zeros((1, 40, 40, 40))
        p = jnp.zeros((1, 4, 3))
        params = net.init(jax.random.PRNGKey(0), tsdf, p, p)
        planner = GIGAPlanner(net=net, model_cfg=cfg, params=params,
                              force_detection=True, rng=np.random.RandomState(0))
        grid = np.random.RandomState(0).rand(1, 40, 40, 40).astype(np.float32)
        grasps, scores, toc = planner(State(tsdf=grid))
        assert isinstance(grasps, list) and toc > 0


class TestPostprocess:
    @pytest.mark.parametrize("force", [False, True])
    def test_matches_reference_pipeline(self, force):
        rng = np.random.RandomState(3)
        R = 40
        cfg = PlannerConfig(force_detection=force)
        voxel_size = 0.3 / R
        # synthetic TSDF with a plausible mix of free/band/unobserved space
        tsdf = rng.rand(R, R, R).astype(np.float32)
        qual = (rng.rand(R, R, R) ** 0.25).astype(np.float32)  # plenty above 0.9
        rot = rng.randn(R, R, R, 4).astype(np.float32)
        width = rng.uniform(0.0, 0.3, (R, R, R)).astype(np.float32)

        golden = reference_postprocess(tsdf, qual.copy(), rot, width, cfg, voxel_size)

        q = mask_quality(jnp.asarray(qual), jnp.asarray(tsdf), jnp.asarray(width), cfg)
        q = bound_quality(q, voxel_size, cfg)
        pos = jnp.stack(
            jnp.meshgrid(*(jnp.arange(R, dtype=jnp.float32),) * 3, indexing="ij"), axis=-1
        )
        cands = jax.device_get(select_grasps(q, jnp.asarray(rot), jnp.asarray(width), pos, cfg))

        ours = {
            tuple(int(v) for v in cands.positions[i]): float(cands.scores[i])
            for i in range(int(cands.count))
        }
        theirs = {idx: float(s) for idx, s in golden}
        assert set(ours) == set(theirs)
        for idx in ours:
            assert ours[idx] == pytest.approx(theirs[idx], abs=1e-5)

    def test_force_detection_falls_back_to_best(self):
        R = 16
        cfg = PlannerConfig(force_detection=True, max_grasps=8, bound_limits=(0.0, 0.0, 0.0))
        qual = np.full((R, R, R), 0.0, np.float32)
        qual[6:11, 6:11, 6:11] = 0.7  # blob above LOW_TH but below qual_th
        tsdf = np.full((R, R, R), 0.8, np.float32)  # all 'outside' -> valid
        width = np.full((R, R, R), 0.1, np.float32)
        rot = np.zeros((R, R, R, 4), np.float32)
        q = mask_quality(jnp.asarray(qual), jnp.asarray(tsdf), jnp.asarray(width), cfg)
        pos = jnp.stack(
            jnp.meshgrid(*(jnp.arange(R, dtype=jnp.float32),) * 3, indexing="ij"), axis=-1
        )
        cands = jax.device_get(select_grasps(q, jnp.asarray(rot), jnp.asarray(width), pos, cfg))
        assert int(cands.count) == 1  # best_only keeps a single grasp
        assert cands.scores[0] > 0.5


class TestPlannerEndToEnd:
    def test_runs_on_raw_grid(self, giga_net_params):
        net, cfg, params = giga_net_params
        planner = GIGAPlanner(
            net=net, model_cfg=cfg, params=params,
            force_detection=True, best=True, rng=np.random.RandomState(0),
        )
        rng = np.random.RandomState(1)
        grid = rng.rand(1, 40, 40, 40).astype(np.float32)
        grasps, scores, toc = planner(State(tsdf=grid))
        assert isinstance(grasps, list) and toc > 0
        for g in grasps:
            assert g.pose.translation.shape == (3,)
            assert 0 <= g.width


class TestNMSWindowRule:
    """Both planners widen the NMS max-filter to 8 under visualize=True,
    matching the reference (detection.py:60, detection_implicit.py:59)."""

    def test_giga_planner_nms_window(self, giga_net_params):
        net, cfg, params = giga_net_params
        mk = lambda viz: GIGAPlanner(net=net, model_cfg=cfg, params=params,
                                     visualize=viz)
        assert mk(False).planner_cfg.max_filter_size == 4
        assert mk(True).planner_cfg.max_filter_size == 8

    def test_vgn_planner_nms_window(self):
        from giga_tpu.inference.planner import VGNPlanner

        vgn_net, _ = get_network("vgn")
        vgn_params = vgn_net.init(jax.random.PRNGKey(1), jnp.zeros((1, 40, 40, 40)))
        mk = lambda viz: VGNPlanner(net=vgn_net, params=vgn_params, visualize=viz)
        assert mk(False).planner_cfg.max_filter_size == 4
        assert mk(True).planner_cfg.max_filter_size == 8

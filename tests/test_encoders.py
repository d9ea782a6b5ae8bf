"""Tests for the alternative encoders/decoders: LocalPoolPointnet, UNet3D,
grid sampling, FCDecoder, LocalPointDecoder, grad_refine, visualization."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from giga_tpu.core.config import DecoderConfig, EncoderConfig
from giga_tpu.models.pointnet import LocalPoolPointnet
from giga_tpu.models.unet3d import UNet3D
from giga_tpu.ops.sampling import sample_grid


class TestLocalPoolPointnet:
    def test_shapes_and_grad(self):
        enc = LocalPoolPointnet(
            EncoderConfig(plane_resolution=16), hidden_dim=8, n_blocks=3
        )
        rng = np.random.RandomState(0)
        p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 3)), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), p)
        fea = enc.apply(params, p)
        assert set(fea) == {"xz", "xy", "yz"}
        for v in fea.values():
            assert v.shape == (2, 16, 16, 32)

        def loss(pp):
            out = enc.apply(pp, p)
            return sum(jnp.sum(v**2) for v in out.values())

        g = jax.grad(loss)(params)
        assert np.isfinite(
            float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))
        )

    def test_patch_variant(self):
        from giga_tpu.models.pointnet import PatchLocalPoolPointnet

        enc = PatchLocalPoolPointnet(
            EncoderConfig(plane_resolution=8), hidden_dim=8, n_blocks=2,
            pos_encoding="sin_cos",
        )
        rng = np.random.RandomState(7)
        p = jnp.asarray(rng.uniform(0, 1, (2, 32, 3)), jnp.float32)
        index = {
            t: jnp.asarray(rng.randint(0, 64, (2, 32)), jnp.int32)
            for t in ("xz", "xy", "yz")
        }
        params = enc.init(jax.random.PRNGKey(0), p, index)
        fea = enc.apply(params, p, index)
        assert all(fea[t].shape == (2, 8, 8, 32) for t in ("xz", "xy", "yz"))

    def test_mean_scatter_variant(self):
        enc = LocalPoolPointnet(
            EncoderConfig(plane_resolution=8), hidden_dim=4, n_blocks=2, scatter_type="mean"
        )
        p = jnp.zeros((1, 16, 3))
        params = enc.init(jax.random.PRNGKey(1), p)
        fea = enc.apply(params, p)
        assert fea["xy"].shape == (1, 8, 8, 32)


class TestTriplaneEncoderGeneralPath:
    def test_mixed_resolution_uses_scatter(self):
        """Input resolution != plane resolution exercises the segment-mean
        branch (reference supports e.g. 120^3 TSDF -> 40^2 planes)."""
        from giga_tpu.models.encoder import TriplaneVoxelEncoder

        enc = TriplaneVoxelEncoder(EncoderConfig(plane_resolution=8))
        x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 16), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)
        planes = enc.apply(params, x)
        for t in ("xz", "xy", "yz"):
            assert planes[t].shape == (1, 8, 8, 32)
            assert np.isfinite(np.asarray(planes[t])).all()


class TestUNet3D:
    def test_shapes(self):
        net = UNet3D(out_channels=16, f_maps=8, num_levels=2)
        x = jnp.zeros((1, 8, 8, 8, 4))
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (1, 8, 8, 8, 16)


class TestGridSampling:
    def test_matches_torch_trilinear(self):
        rng = np.random.RandomState(0)
        grid = rng.randn(6, 7, 8, 4).astype(np.float32)  # (D, H, W, C)
        p = rng.uniform(-0.55, 0.55, (200, 3)).astype(np.float32)
        ours = np.asarray(sample_grid(jnp.asarray(grid), jnp.asarray(p)))

        # torch golden: normalize_3d (1e-3 eps) + grid_sample trilinear border
        pt = torch.from_numpy(p)
        u = pt / (1 + 1e-3) + 0.5
        u = torch.where(u >= 1, torch.full_like(u, 1 - 1e-3), u)
        u = torch.clamp(u, min=0.0)
        vgrid = (2.0 * u - 1.0)[None, :, None, None, :]  # (1, N, 1, 1, 3)
        c = torch.from_numpy(grid.transpose(3, 0, 1, 2))[None]  # (1, C, D, H, W)
        gold = F.grid_sample(c, vgrid, padding_mode="border", align_corners=True,
                             mode="bilinear")
        gold = gold[0, :, :, 0, 0].T.numpy()
        np.testing.assert_allclose(ours, gold, atol=1e-5)


class TestDecoderVariants:
    def test_fc_decoder(self):
        from giga_tpu.models.decoder import FCDecoder

        dec = FCDecoder(DecoderConfig())
        planes = {t: jnp.zeros((1, 8, 8, 32)) for t in ("xz", "xy", "yz")}
        p = jnp.zeros((1, 5, 3))
        params = dec.init(jax.random.PRNGKey(0), planes, p)
        out = dec.apply(params, planes, p)
        assert out.shape == (1, 5)

    def test_local_point_decoder(self):
        from giga_tpu.models.decoder import LocalPointDecoder

        dec = LocalPointDecoder(DecoderConfig(c_dim=16, concat_feat=False))
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 32, 3)), jnp.float32)
        feats = jnp.asarray(rng.randn(1, 32, 16), jnp.float32)
        q = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 7, 3)), jnp.float32)
        params = dec.init(jax.random.PRNGKey(0), pts, feats, q)
        out = dec.apply(params, pts, feats, q)
        assert out.shape == (1, 7)


class TestGradRefine:
    def test_refine_moves_points_within_bounds(self):
        from giga_tpu.models.registry import get_network

        net, cfg = get_network("giga_aff")
        tsdf = jnp.asarray(np.random.RandomState(0).rand(1, 40, 40, 40), jnp.float32)
        pos = jnp.zeros((1, 4, 3))
        params = net.init(jax.random.PRNGKey(0), tsdf, pos)
        qual, p2, rot, width = net.apply(
            params, tsdf, pos, bound_value=0.01, lr=1e-3, num_step=2, method="grad_refine"
        )
        assert qual.shape == (1, 4)
        assert np.all(np.abs(np.asarray(p2) - np.asarray(pos)) <= 0.01 + 1e-7)


class TestVisual:
    def test_affordance_and_glyphs(self, tmp_path):
        from giga_tpu.core.grasp import Grasp
        from giga_tpu.core.transform import Rotation, Transform
        from giga_tpu.geometry.mesh import box_mesh
        from giga_tpu.utils import visual

        rng = np.random.RandomState(0)
        qual = rng.rand(10, 10, 10).astype(np.float32)
        rot = np.tile(np.r_[0.0, 0.0, 0.0, 1.0], (10, 10, 10, 1)).astype(np.float32)
        scene = box_mesh([0.1, 0.1, 0.1], center=(0.15, 0.15, 0.15))
        colored = visual.affordance_visual(qual, rot, scene, size=0.3, resolution=10)
        assert colored.face_colors.shape == (len(colored.faces), 4)

        g = Grasp(Transform(Rotation.identity(), [0.15, 0.15, 0.15]), 0.05)
        glyph = visual.grasp2mesh(g, 0.9)
        assert len(glyph.faces) > 0
        composed = visual.compose_scene(colored, [g], [0.9])
        visual.export_ply(composed, tmp_path / "scene.ply")
        text = (tmp_path / "scene.ply").read_text()
        assert "element face" in text and "red" in text


class TestZBandedConvStem:
    def test_banded_equals_direct_conv(self):
        """The z-banded 2D formulation must reproduce the plain conv3d (the
        off-band kernel entries are exact zeros)."""
        from giga_tpu.models.layers import ZBandedConvStem

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 12, 12, 12, 1).astype(np.float32))
        direct = ZBandedConvStem(8, 3, use_zbanded=False)
        banded = ZBandedConvStem(8, 3, use_zbanded=True)
        params = direct.init(jax.random.PRNGKey(0), x)
        with jax.default_matmul_precision("highest"):
            a = direct.apply(params, x)
            b = banded.apply(params, x)
        assert a.shape == (2, 12, 12, 12, 8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_param_tree_matches_torchconv(self):
        from giga_tpu.models.layers import TorchConv, ZBandedConvStem

        x = jnp.zeros((1, 8, 8, 8, 1))
        p1 = TorchConv(4, 3, name="conv_in").init(jax.random.PRNGKey(0), x)
        p2 = ZBandedConvStem(4, 3, name="conv_in").init(jax.random.PRNGKey(0), x)
        s1 = jax.tree_util.tree_structure(p1)
        s2 = jax.tree_util.tree_structure(p2)
        assert s1 == s2
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            assert a.shape == b.shape

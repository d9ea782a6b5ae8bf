"""Sliding-window generation + PatchLocalDecoder + positional encodings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from giga_tpu.core.config import DecoderConfig
from giga_tpu.geometry.sliding_window import SlidingWindowGenerator, compute_crop_bounds
from giga_tpu.ops.sampling import map2local, normalize_coord, positional_encoding_sincos


class TestCropBounds:
    def test_tiling_covers_bbox(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(0, 1.0, (500, 3))
        vb = compute_crop_bounds(pts, query_crop_size=0.4, input_crop_size=0.6)
        assert vb["n_crop"] == np.prod(vb["axis_n_crop"])
        los = vb["query_vol"][:, 0]
        his = vb["query_vol"][:, 1]
        assert np.all(los.min(axis=0) <= pts.min(axis=0))
        assert np.all(his.max(axis=0) >= pts.max(axis=0))
        # input crops are centered supersets of query crops
        assert np.all(vb["input_vol"][:, 0] <= vb["query_vol"][:, 0] + 1e-9)


class TestSlidingWindowGenerator:
    def test_analytic_sphere_across_crops(self):
        """A sphere spanning multiple crops must reconstruct seamlessly."""
        center = np.array([0.5, 0.5, 0.5])
        radius = 0.3

        rng = np.random.RandomState(0)
        dirs = rng.randn(2000, 3)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        surface = center + dirs * radius

        def encode(points, vol):
            return None  # analytic field needs no latent

        def evaluate(latent, q, vol):
            d = np.linalg.norm(q - center, axis=1)
            return (radius - d) * 50.0  # logits

        gen = SlidingWindowGenerator(encode, evaluate, resolution=24)
        mesh = gen.generate_mesh(surface, query_crop_size=0.45, input_crop_size=0.6)
        assert len(mesh.faces) > 0
        r = np.linalg.norm(mesh.vertices - center, axis=1)
        assert abs(np.median(r) - radius) < 0.03
        # watertight across crop boundaries
        f = mesh.faces
        edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert np.all(counts == 2)


class TestPatchDecoder:
    def test_forward_shapes(self):
        from giga_tpu.models.decoder import PatchLocalDecoder

        dec = PatchLocalDecoder(DecoderConfig(c_dim=96), pos_encoding="sin_cos")
        rng = np.random.RandomState(0)
        B, N = 1, 10
        p = jnp.asarray(rng.uniform(0, 1, (B, N, 3)), jnp.float32)
        p_n = {t: jnp.asarray(rng.uniform(0, 1, (B, N, 2)), jnp.float32) for t in ("xz", "xy", "yz")}
        planes = {t: jnp.asarray(rng.randn(B, 8, 8, 96), jnp.float32) for t in ("xz", "xy", "yz")}
        params = dec.init(jax.random.PRNGKey(0), p, p_n, planes)
        out = dec.apply(params, p, p_n, planes)
        assert out.shape == (B, N)


class TestEncodings:
    def test_sincos_dims_and_range(self):
        p = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (5, 3)), jnp.float32)
        enc = positional_encoding_sincos(p)
        assert enc.shape == (5, 60)
        assert float(jnp.abs(enc).max()) <= 1.0 + 1e-6

    def test_map2local(self):
        p = jnp.asarray([[0.25, 0.125, 0.37]], jnp.float32)
        local = map2local(p, 0.1)
        np.testing.assert_allclose(np.asarray(local)[0], [0.5, 0.25, 0.7], atol=1e-5)

    def test_normalize_coord(self):
        p = jnp.asarray([[0.5, 1.0, 1.5]], jnp.float32)
        u = normalize_coord(p, (np.zeros(3), np.full(3, 2.0)), "xz")
        np.testing.assert_allclose(np.asarray(u)[0], [0.25, 0.75], atol=1e-6)
        u3 = normalize_coord(p, (np.zeros(3), np.full(3, 2.0)), "grid")
        np.testing.assert_allclose(np.asarray(u3)[0], [0.25, 0.5, 0.75], atol=1e-6)

"""Golden tests for device ops against torch / scipy semantics."""

import numpy as np
import pytest
import scipy.ndimage as ndi
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from giga_tpu.ops.filters import gaussian_blur_3d, masked_binary_dilation, max_filter_3d
from giga_tpu.ops.sampling import (
    interp_matrix_1d,
    normalize_coordinate,
    sample_plane,
    sample_plane_lattice,
    sample_planes_concat,
)
from giga_tpu.ops.scatter import plane_index, scatter_mean_planes


def torch_sample_plane(plane_chw, p, plane_type, padding=0.0):
    """Reference chain: normalize -> grid_sample(border, align_corners=True)."""
    axes = {"xz": (0, 2), "xy": (0, 1), "yz": (1, 2)}[plane_type]
    pt = torch.from_numpy(p[None])
    u = pt[:, :, list(axes)] / (1 + padding + 1e-5) + 0.5
    u = torch.where(u >= 1, torch.full_like(u, 1 - 1e-5), u)
    u = torch.clamp(u, min=0.0)
    vgrid = 2.0 * u[:, :, None] - 1.0
    c = F.grid_sample(
        torch.from_numpy(plane_chw[None]),
        vgrid,
        padding_mode="border",
        align_corners=True,
        mode="bilinear",
    )
    return c.squeeze(-1).squeeze(0).T.numpy()  # (N, C)


class TestPlaneSampling:
    @pytest.mark.parametrize("plane_type", ["xz", "xy", "yz"])
    def test_matches_torch_grid_sample(self, plane_type):
        rng = np.random.RandomState(0)
        plane = rng.randn(8, 40, 40).astype(np.float32)  # (C, H, W)
        p = rng.uniform(-0.55, 0.55, (500, 3)).astype(np.float32)  # incl. out-of-range
        golden = torch_sample_plane(plane, p, plane_type)
        ours = sample_plane(jnp.asarray(plane.transpose(1, 2, 0)), jnp.asarray(p), plane_type)
        np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-5)

    def test_exact_at_pixel_centers(self):
        rng = np.random.RandomState(1)
        plane = rng.randn(40, 40, 4).astype(np.float32)
        # u = i/39 maps exactly to pixel i; invert the normalization
        i, j = 7, 23
        u0, u1 = i / 39.0, j / 39.0
        p = np.array([[(u0 - 0.5) * (1 + 1e-5), 0.0, (u1 - 0.5) * (1 + 1e-5)]], np.float32)
        out = sample_plane(jnp.asarray(plane), jnp.asarray(p), "xz")
        np.testing.assert_allclose(np.asarray(out)[0], plane[j, i], atol=1e-5)

    def test_lattice_matmul_equals_gather(self):
        rng = np.random.RandomState(2)
        plane = jnp.asarray(rng.randn(40, 40, 8).astype(np.float32))
        coords = jnp.linspace(-0.5, 0.5 - 1.0 / 40, 40)
        m = interp_matrix_1d(coords, 40)
        lattice = sample_plane_lattice(plane, m, m)  # (40, 40, 8): [row_q, col_q]
        # gather path on the product lattice (xz plane: axis0=col, axis2=row)
        cols, rows = jnp.meshgrid(coords, coords, indexing="ij")
        p = jnp.stack([cols.ravel(), jnp.zeros(1600), rows.ravel()], axis=-1)
        gathered = sample_plane(plane, p, "xz").reshape(40, 40, 8)  # [col_q, row_q]
        np.testing.assert_allclose(
            np.asarray(lattice), np.asarray(gathered).transpose(1, 0, 2), atol=1e-5
        )

    @pytest.mark.parametrize("plane_type", ["xz", "xy", "yz"])
    def test_mm_equals_gather_arbitrary_points(self, plane_type):
        import jax

        from giga_tpu.ops.sampling import sample_plane_mm

        rng = np.random.RandomState(4)
        plane = jnp.asarray(rng.randn(40, 40, 8).astype(np.float32))
        p = jnp.asarray(rng.uniform(-0.55, 0.55, (500, 3)).astype(np.float32))
        gathered = sample_plane(plane, p, plane_type)
        mm = sample_plane_mm(plane, p, plane_type,
                             precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(gathered),
                                   atol=1e-5)

    def test_mm_chunked_matches_unchunked(self):
        import jax

        from giga_tpu.ops.sampling import sample_plane_mm

        rng = np.random.RandomState(5)
        plane = jnp.asarray(rng.randn(40, 40, 8).astype(np.float32))
        # n=300 not divisible by chunk=128: exercises padding + slice-off
        p = jnp.asarray(rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32))
        hi = jax.lax.Precision.HIGHEST
        whole = sample_plane_mm(plane, p, "xz", precision=hi)
        chunked = sample_plane_mm(plane, p, "xz", chunk=128, precision=hi)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                                   atol=1e-6)

    def test_mm_concat_matches_gather_concat(self):
        import jax

        from giga_tpu.ops.sampling import sample_planes_concat_mm

        rng = np.random.RandomState(6)
        planes = {t: jnp.asarray(rng.randn(40, 40, 8).astype(np.float32))
                  for t in ("xz", "xy", "yz")}
        p = jnp.asarray(rng.uniform(-0.55, 0.55, (200, 3)).astype(np.float32))
        golden = sample_planes_concat(planes, p)
        mm = sample_planes_concat_mm(planes, p,
                                     precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(golden),
                                   atol=1e-5)

    def test_decoder_sampler_config_mm(self):
        """DecoderConfig.sampler='mm_highest' routes query_planes through the
        MXU formulation and matches the gather default through the full
        occupancy decode (the giga_geo 100k-query path)."""
        import dataclasses

        import jax

        from giga_tpu.models.registry import get_network

        net, cfg = get_network("giga_geo")
        rng = np.random.RandomState(7)
        grid = jnp.asarray(rng.rand(1, 40, 40, 40).astype(np.float32))
        p = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 64, 3)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), grid, None, p)
        planes = net.apply(params, grid, method="encode")
        golden = net.apply(params, planes, p, method="decode_occupancy")

        cfg_mm = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, sampler="mm_highest")
        )
        net_mm = type(net)(cfg=cfg_mm)
        out = net_mm.apply(params, planes, p, method="decode_occupancy")
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   atol=1e-5)
        # default-precision 'mm' stays close (bf16-class matmul drift)
        cfg_d = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, sampler="mm")
        )
        out_d = type(net)(cfg=cfg_d).apply(
            params, planes, p, method="decode_occupancy")
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(golden),
                                   atol=5e-2)

    def test_concat_order(self):
        rng = np.random.RandomState(3)
        planes = {t: jnp.asarray(rng.randn(40, 40, 2).astype(np.float32)) for t in ("xz", "xy", "yz")}
        p = jnp.asarray(rng.uniform(-0.5, 0.5, (10, 3)).astype(np.float32))
        cat = sample_planes_concat(planes, p)
        np.testing.assert_allclose(cat[:, :2], sample_plane(planes["xz"], p, "xz"))
        np.testing.assert_allclose(cat[:, 2:4], sample_plane(planes["xy"], p, "xy"))
        np.testing.assert_allclose(cat[:, 4:6], sample_plane(planes["yz"], p, "yz"))


class TestScatter:
    def test_lattice_index_map_is_identity(self):
        """The SURVEY section 7.1 caveat: voxel-lattice coords must map to their
        own plane cell through the normalize->floor chain."""
        coords = np.linspace(-0.5, 0.5, 40)
        u = np.asarray(normalize_coordinate(jnp.asarray(coords)))
        idx = np.floor(u * 40).astype(int)
        np.testing.assert_array_equal(idx, np.arange(40))

    def test_scatter_equals_axis_mean(self):
        rng = np.random.RandomState(4)
        n = 16
        feat = rng.randn(1, n**3, 8).astype(np.float32)
        axes = [np.linspace(-0.5, 0.5, n)] * 3
        g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(1, -1, 3).astype(np.float32)
        plane = scatter_mean_planes(jnp.asarray(g), jnp.asarray(feat), "xz", n)
        vol = feat.reshape(n, n, n, 8)
        golden = vol.mean(axis=1).transpose(1, 0, 2)  # mean over y -> (z, x, c)
        np.testing.assert_allclose(np.asarray(plane)[0], golden, atol=1e-5)

    def test_plane_index_matches_reference_formula(self):
        rng = np.random.RandomState(5)
        p = rng.uniform(-0.5, 0.5, (1, 100, 3)).astype(np.float32)
        idx = np.asarray(plane_index(jnp.asarray(p), "xy", 40))
        u = np.asarray(normalize_coordinate(jnp.asarray(p[..., :2])))
        golden = (u[..., 0] * 40).astype(int) + 40 * (u[..., 1] * 40).astype(int)
        np.testing.assert_array_equal(idx, golden)


class TestFilters:
    def test_gaussian_matches_scipy(self):
        rng = np.random.RandomState(6)
        vol = rng.rand(25, 30, 20).astype(np.float32)
        golden = ndi.gaussian_filter(vol, sigma=1.0, mode="nearest")
        ours = np.asarray(gaussian_blur_3d(jnp.asarray(vol), sigma=1.0))
        np.testing.assert_allclose(ours, golden, atol=1e-5)

    def test_masked_dilation_matches_scipy(self):
        rng = np.random.RandomState(7)
        seed = rng.rand(20, 20, 20) > 0.9
        mask = rng.rand(20, 20, 20) > 0.3
        golden = ndi.binary_dilation(seed, iterations=2, mask=mask)
        ours = np.asarray(masked_binary_dilation(jnp.asarray(seed), jnp.asarray(mask), 2))
        np.testing.assert_array_equal(ours, golden)

    @pytest.mark.parametrize("size", [4, 8])
    def test_max_filter_matches_scipy(self, size):
        rng = np.random.RandomState(8)
        vol = rng.rand(20, 22, 24).astype(np.float32)
        golden = ndi.maximum_filter(vol, size=size)
        ours = np.asarray(max_filter_3d(jnp.asarray(vol), size))
        np.testing.assert_allclose(ours, golden)

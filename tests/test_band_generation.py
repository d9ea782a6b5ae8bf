"""Device-banded mesh generation: sparse marching kernel parity with the
dense kernel, dense-vs-refine strategy agreement, and band-overflow fallback
(geometry/generation.py one-dispatch path)."""

import numpy as np
import pytest

from giga_tpu.geometry import native
from giga_tpu.geometry.generation import MeshGenerator


def _sphere_grid(n=33, r=12.0):
    lin = np.arange(n, dtype=np.float64)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    c = (n - 1) / 2.0
    return r - np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2)


def _active_cells(grid, iso):
    n = grid.shape[0]
    ins = grid > iso
    any_in = np.zeros((n - 1,) * 3, bool)
    all_in = np.ones((n - 1,) * 3, bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                s = ins[dx : n - 1 + dx, dy : n - 1 + dy, dz : n - 1 + dz]
                any_in |= s
                all_in &= s
    idx = np.flatnonzero(any_in & ~all_in)
    xs, ys, zs = np.unravel_index(idx, (n - 1,) * 3)
    corner = np.empty((len(idx), 8))
    for ci in range(8):
        dx, dy, dz = ci & 1, (ci >> 1) & 1, (ci >> 2) & 1
        corner[:, ci] = grid[xs + dx, ys + dy, zs + dz]
    return idx, corner


class TestSparseMarching:
    def test_matches_dense_kernel_exactly(self):
        grid = _sphere_grid()
        v1, f1 = native.marching_tetrahedra(grid, 0.0)
        idx, corner = _active_cells(grid, 0.0)
        v2, f2 = native.marching_tetrahedra_cells(idx, corner, grid.shape, 0.0)
        assert len(v1) == len(v2) and len(f1) == len(f2)
        s1 = set(map(tuple, np.round(v1, 9)))
        s2 = set(map(tuple, np.round(v2, 9)))
        assert s1 == s2

    def test_local_winding_outward(self):
        grid = _sphere_grid()
        idx, corner = _active_cells(grid, 0.0)
        v, f = native.marching_tetrahedra_cells(idx, corner, grid.shape, 0.0)
        tri = v[f]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        out = nrm * (tri.mean(1) - 16.0)
        # sliver triangles can flip the centroid test; the bulk must be outward
        assert (out.sum(1) > 0).mean() > 0.95

    def test_empty_cell_list(self):
        v, f = native.marching_tetrahedra_cells(
            np.zeros(0, np.int64), np.zeros((0, 8)), (8, 8, 8), 0.0
        )
        assert len(v) == 0 and len(f) == 0


@pytest.fixture(scope="module")
def geo_model():
    import jax

    from giga_tpu.models.registry import get_network

    net, cfg = get_network("giga_geo")
    import jax.numpy as jnp

    tsdf = jnp.zeros((1, 40, 40, 40), jnp.float32)
    p = jnp.zeros((1, 1, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), tsdf, None, p)
    return net, params


@pytest.fixture(scope="module")
def scene_tsdf():
    from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

    r = np.random.RandomState(0)
    return mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r)


class TestStrategies:
    def test_dense_matches_refine(self, geo_model, scene_tsdf):
        """The one-dispatch banded path and the device-refine path must
        produce the same surface (same lattice values near the surface)."""
        net, params = geo_model
        gen_d = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                              strategy="dense")
        gen_r = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                              strategy="refine")
        m_d = gen_d.generate_mesh(scene_tsdf, return_stats=False)
        m_r, stats = gen_r.generate_mesh(scene_tsdf)
        assert stats.get("refine (device)"), "device refine path not taken"
        assert len(m_d.vertices) > 0
        # identical triangle counts and vertex sets up to fp16 interpolation
        assert abs(len(m_d.faces) - len(m_r.faces)) <= 0.01 * len(m_r.faces)
        from scipy.spatial import cKDTree

        cell = 1.0 / 32  # res0=16, 1 upsampling step, box [-0.5, 0.5]
        d, _ = cKDTree(m_r.vertices).query(m_d.vertices)
        # refine interpolates values away from the band, so isolated vertices
        # may shift; the surface as a whole must coincide
        assert np.quantile(d, 0.99) < 0.05 * cell
        assert d.max() < 1.5 * cell

    def test_batched_matches_per_scene(self, geo_model, scene_tsdf):
        """generate_meshes (one dispatch for B scenes) == generate_mesh per
        scene, vertex for vertex."""
        from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

        net, params = geo_model
        gen = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                            strategy="dense")
        r = np.random.RandomState(3)
        other = mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r)
        batch = np.stack([np.squeeze(scene_tsdf), np.squeeze(other)])
        meshes = gen.generate_meshes(batch)
        assert len(meshes) == 2
        for b in range(2):
            ref = gen.generate_mesh(batch[b], return_stats=False)
            assert len(meshes[b].faces) == len(ref.faces)
            # batched vs single decode differ by einsum order; fp16 corner
            # rounding bounds the vertex shift well under a cell (1/32)
            np.testing.assert_allclose(
                np.sort(meshes[b].vertices, axis=0),
                np.sort(ref.vertices, axis=0), atol=5e-3,
            )

    def test_device_refine_matches_host_refine(self, geo_model, scene_tsdf):
        """The single-program device refinement reproduces the hierarchical
        host path's surface (same MISE band assumption, same fine values)."""
        net, params = geo_model
        gen = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                            strategy="refine")
        m_dev, stats = gen.generate_mesh(scene_tsdf)
        assert stats.get("refine (device)")
        gen._refine_tiers = []  # force the host refine_grid route
        m_host = gen.generate_mesh(scene_tsdf, return_stats=False)
        assert abs(len(m_dev.faces) - len(m_host.faces)) <= 0.01 * len(m_host.faces)
        from scipy.spatial import cKDTree

        cell = 1.0 / 32
        d, _ = cKDTree(m_host.vertices).query(m_dev.vertices)
        assert np.quantile(d, 0.99) < 0.05 * cell
        assert d.max() < 1.5 * cell

    def test_multilevel_device_refine_matches_host(self, geo_model, scene_tsdf):
        """The refine chain with 2 levels (dense at res0, two sparse
        refinements) reproduces the host refine_grid surface."""
        net, params = geo_model
        gen = MeshGenerator(net, params, resolution0=8, upsampling_steps=2,
                            strategy="refine")
        m_dev, stats = gen.generate_mesh(scene_tsdf)
        assert stats.get("refine (device)")
        band, pts = stats["refine cells (band/points-per-level)"]
        assert len(pts) == 2 and pts[1] > pts[0] > 0
        gen._refine_tiers = []  # force the host refine_grid route
        m_host = gen.generate_mesh(scene_tsdf, return_stats=False)
        assert abs(len(m_dev.faces) - len(m_host.faces)) <= 0.01 * len(m_host.faces)
        from scipy.spatial import cKDTree

        cell = 1.0 / 32
        d, _ = cKDTree(m_host.vertices).query(m_dev.vertices)
        assert np.quantile(d, 0.99) < 0.05 * cell
        assert d.max() < 1.5 * cell

    def test_batched_refine_matches_per_scene(self, geo_model, scene_tsdf):
        """generate_meshes with strategy='refine' (vmapped chain, one
        dispatch) == generate_mesh per scene."""
        from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

        net, params = geo_model
        gen = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                            strategy="refine")
        r = np.random.RandomState(3)
        other = mesh_to_tsdf(random_scene(r, 0.3), 0.3, 40, rng=r)
        batch = np.stack([np.squeeze(scene_tsdf), np.squeeze(other)])
        meshes = gen.generate_meshes(batch)
        assert len(meshes) == 2
        for b in range(2):
            ref = gen.generate_mesh(batch[b], return_stats=False)
            assert len(meshes[b].faces) == len(ref.faces)
            np.testing.assert_allclose(
                np.sort(meshes[b].vertices, axis=0),
                np.sort(ref.vertices, axis=0), atol=5e-3,
            )

    def test_refine_budget_overflow_falls_back(self, geo_model, scene_tsdf):
        """Exceeding the fine-cell budget must fall back to the exact host
        path, not truncate the surface."""
        import jax

        net, params = geo_model
        gen = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                            strategy="refine")
        ref = gen.generate_mesh(scene_tsdf, return_stats=False)
        gen2 = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                             strategy="refine")
        gen2._refine_tiers = [(8, (8,))]  # force overflow in every tier
        gen2._refine_band_cache = {}
        m, stats = gen2.generate_mesh(scene_tsdf)
        assert not stats.get("refine (device)")
        assert abs(len(m.faces) - len(ref.faces)) <= 0.01 * len(ref.faces)

    def test_band_overflow_falls_back(self, geo_model, scene_tsdf):
        net, params = geo_model
        gen = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                            strategy="dense")
        ref = gen.generate_mesh(scene_tsdf, return_stats=False)
        gen2 = MeshGenerator(net, params, resolution0=16, upsampling_steps=1,
                             strategy="dense")
        gen2.band_cells = 4  # force overflow -> full-grid fetch path
        import jax

        gen2._band = jax.jit(gen2._build_band_eval(17))
        m = gen2.generate_mesh(scene_tsdf, return_stats=False)
        assert len(m.faces) == len(ref.faces)
        # same geometry through either route
        v1 = set(map(tuple, np.round(ref.vertices, 5)))
        v2 = set(map(tuple, np.round(m.vertices, 5)))
        assert v1 == v2

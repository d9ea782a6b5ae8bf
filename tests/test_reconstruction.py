"""Reconstruction stack tests: marching tetrahedra, hierarchical refinement,
mesh generation from a model, and evaluation metrics."""

import numpy as np
import pytest

import jax

from giga_tpu.geometry.eval import MeshEvaluator, compute_iou
from giga_tpu.geometry.mesh import TriMesh, box_mesh
from giga_tpu.geometry.native import marching_tetrahedra
from giga_tpu.geometry.refine import refine_grid


def sphere_field(frac_points, center=0.5, radius=0.3):
    """Signed field > 0 inside a sphere, on [0,1]^3 fractions."""
    d = np.linalg.norm(frac_points - center, axis=-1)
    return radius - d


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        n = 32
        lin = np.linspace(0, 1, n)
        pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
        field = sphere_field(pts).reshape(n, n, n)
        v, f = marching_tetrahedra(field, 0.0)
        assert len(v) > 0 and len(f) > 0
        m = TriMesh(v / (n - 1), f)
        r = np.linalg.norm(m.vertices - 0.5, axis=1)
        assert abs(r.mean() - 0.3) < 0.01
        # watertight: every edge shared by exactly 2 faces
        edges = np.sort(
            np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
        )
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert np.all(counts == 2)

    def test_empty_grid(self):
        v, f = marching_tetrahedra(np.zeros((8, 8, 8)), 0.5)
        assert len(v) == 0 and len(f) == 0


class TestRefineGrid:
    def test_matches_dense_near_surface(self):
        calls = []

        def eval_fn(p):
            calls.append(len(p))
            return sphere_field(p)

        grid = refine_grid(eval_fn, resolution0=8, upsampling_steps=2, threshold=0.0)
        n = grid.shape[0]
        assert n == 33
        lin = np.linspace(0, 1, n)
        pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        dense = sphere_field(pts.reshape(-1, 3)).reshape(n, n, n)
        # signs agree everywhere (the decided regions interpolate but a smooth
        # field's sign survives; the band is evaluated exactly)
        np.testing.assert_array_equal(grid > 0, dense > 0)
        near = np.abs(dense) < 0.04
        np.testing.assert_allclose(grid[near], dense[near], atol=1e-12)
        # refinement must evaluate fewer points than dense at full res
        assert sum(calls) < n**3

    def test_resolution_is_res0_times_2_steps(self):
        grid = refine_grid(sphere_field, 4, 3, 0.0)
        assert grid.shape == (33, 33, 33)


class TestMeshGenerator:
    def test_generates_mesh_from_model(self):
        from giga_tpu.geometry.generation import MeshGenerator
        from giga_tpu.models.registry import get_network
        import jax.numpy as jnp

        net, cfg = get_network("giga_geo")
        tsdf = jnp.zeros((1, 40, 40, 40))
        p = jnp.zeros((1, 4, 3))
        params = net.init(jax.random.PRNGKey(0), tsdf, None, p)
        gen = MeshGenerator(net, params, resolution0=16, upsampling_steps=1)
        rng = np.random.RandomState(0)
        mesh, stats = gen.generate_mesh(rng.rand(40, 40, 40).astype(np.float32))
        assert isinstance(mesh, TriMesh)
        assert "time (eval points)" in stats and "time (marching cubes)" in stats
        if len(mesh.vertices):
            assert np.all(np.abs(mesh.vertices) <= 0.51)

    def test_bf16_decode_matches_fp32_surface(self):
        """The bf16 decode option must reconstruct essentially the same
        surface as fp32 (iso-surfacing only needs the threshold
        neighborhood)."""
        from giga_tpu.geometry.generation import MeshGenerator
        from giga_tpu.models.registry import get_network, load_params
        from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene

        net, _ = get_network("giga_geo")
        params = load_params("checkpoints/synthetic_giga_geo.msgpack")
        rng = np.random.RandomState(3)
        tsdf = mesh_to_tsdf(random_scene(rng, 0.3), 0.3, 40)
        kw = dict(resolution0=16, upsampling_steps=1)
        m32 = MeshGenerator(net, params, **kw).generate_mesh(tsdf, return_stats=False)
        m16 = MeshGenerator(net, params, precision="bf16", **kw).generate_mesh(
            tsdf, return_stats=False)
        assert len(m32.faces) > 0 and len(m16.faces) > 0
        # vertex clouds should be close: compare via nearest-neighbor distance
        from scipy.spatial import cKDTree

        d, _ = cKDTree(m32.vertices).query(m16.vertices)
        # 33^3 lattice over a unit box -> cell ~0.03; bf16 shifts the surface
        # by well under a cell
        assert np.median(d) < 0.01, f"median NN distance {np.median(d):.4f}"


class TestEstimateNormals:
    def test_unit_normals_from_field_gradient(self):
        from giga_tpu.geometry.generation import MeshGenerator
        from giga_tpu.models.registry import get_network
        import jax.numpy as jnp

        net, cfg = get_network("giga_geo")
        tsdf = jnp.zeros((1, 40, 40, 40))
        p = jnp.zeros((1, 4, 3))
        params = net.init(jax.random.PRNGKey(0), tsdf, None, p)
        gen = MeshGenerator(net, params)
        gen.encode(np.random.RandomState(0).rand(40, 40, 40).astype(np.float32))
        verts = np.random.RandomState(1).uniform(-0.4, 0.4, (50, 3)).astype(np.float32)
        normals = gen.estimate_normals(verts)
        assert normals.shape == (50, 3)
        np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)


class TestMeshEvaluator:
    def test_identical_boxes(self):
        m = box_mesh([0.4, 0.4, 0.4], center=(0.5, 0.5, 0.5))
        rng = np.random.RandomState(0)
        pts_tgt, fi, normals_tgt = m.sample_surface(20000, rng=rng, return_normals=True)
        points_iou = rng.uniform(0, 1, (20000, 3))
        from giga_tpu.geometry.native import check_mesh_contains

        occ_tgt = check_mesh_contains(m, points_iou)
        ev = MeshEvaluator(n_points=20000, rng=np.random.RandomState(1))
        out = ev.eval_mesh(m, pts_tgt, normals_tgt, points_iou, occ_tgt)
        assert out["iou"] == pytest.approx(1.0)
        assert out["chamfer-L1"] < 0.01
        assert out["normals"] > 0.95
        assert out["f-score"] > 0.99

    def test_shifted_box_chamfer(self):
        a = box_mesh([0.4, 0.4, 0.4], center=(0.5, 0.5, 0.5))
        b = box_mesh([0.4, 0.4, 0.4], center=(0.55, 0.5, 0.5))
        rng = np.random.RandomState(0)
        pts_tgt, _, normals_tgt = a.sample_surface(20000, rng=rng, return_normals=True)
        points_iou = rng.uniform(0, 1, (10000, 3))
        from giga_tpu.geometry.native import check_mesh_contains

        occ_tgt = check_mesh_contains(a, points_iou)
        ev = MeshEvaluator(n_points=20000, rng=np.random.RandomState(1))
        out = ev.eval_mesh(b, pts_tgt, normals_tgt, points_iou, occ_tgt)
        assert 0.005 < out["chamfer-L1"] < 0.05
        assert 0.5 < out["iou"] < 0.95

    def test_iou_formula(self):
        a = np.array([1, 1, 0, 0], bool)
        b = np.array([1, 0, 1, 0], bool)
        assert compute_iou(a, b) == pytest.approx(1 / 3)

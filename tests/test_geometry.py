"""Geometry layer tests: mesh type, native containment vs numpy fallback."""

import numpy as np
import pytest

from giga_tpu.geometry import native
from giga_tpu.geometry.mesh import TriMesh, box_mesh, concatenate, load_mesh


class TestTriMesh:
    def test_box_properties(self):
        m = box_mesh([2.0, 4.0, 6.0])
        assert np.allclose(m.bounds, [[-1, -2, -3], [1, 2, 3]])
        assert m.area == pytest.approx(2 * (2 * 4 + 4 * 6 + 2 * 6))
        # outward normals: each face normal dotted with centroid direction > 0
        centroids = m.triangles.mean(axis=1)
        assert np.all(np.einsum("fi,fi->f", m.face_normals, centroids) > 0)

    def test_transform_and_concat(self):
        a = box_mesh([1, 1, 1])
        b = box_mesh([1, 1, 1]).apply_translation([5, 0, 0])
        m = concatenate([a, b])
        assert len(m.faces) == 24
        assert np.allclose(m.bounds[1], [5.5, 0.5, 0.5])

    def test_obj_roundtrip(self, tmp_path):
        m = box_mesh([1, 2, 3])
        m.export(tmp_path / "box.obj")
        m2 = load_mesh(tmp_path / "box.obj")
        assert np.allclose(sorted(map(tuple, m2.vertices)), sorted(map(tuple, m.vertices)))

    def test_surface_sampling(self):
        m = box_mesh([2, 2, 2])
        pts, fi = m.sample_surface(1000, rng=np.random.RandomState(0))
        # all samples on the surface: max-|coord| == 1
        assert np.allclose(np.abs(pts).max(axis=1), 1.0, atol=1e-9)


class TestContainment:
    def test_native_builds(self):
        assert native.get_lib() is not None, "C++ geometry kernel failed to build"

    def test_box_containment(self):
        m = box_mesh([1.0, 1.0, 1.0], center=(0.5, 0.5, 0.5))
        rng = np.random.RandomState(0)
        pts = rng.uniform(-0.5, 1.5, (5000, 3))
        inside = native.check_mesh_contains(m, pts)
        golden = np.all((pts > 0) & (pts < 1), axis=1)
        # allow disagreement only for points within eps of the boundary
        margin = np.min(np.minimum(np.abs(pts), np.abs(1 - pts)), axis=1)
        disagree = inside != golden
        assert not np.any(disagree & (margin > 1e-9))

    def test_native_matches_numpy_fallback(self):
        m = concatenate(
            [
                box_mesh([0.4, 0.4, 0.4], center=(0.3, 0.3, 0.3)),
                box_mesh([0.2, 0.6, 0.3], center=(0.7, 0.5, 0.6)),
            ]
        )
        rng = np.random.RandomState(1)
        pts = rng.uniform(0, 1, (2000, 3))
        got = native.check_mesh_contains(m, pts)
        ref = native._contains_numpy(
            np.asarray(m.vertices, float), np.asarray(m.faces), pts
        )
        np.testing.assert_array_equal(got, ref)

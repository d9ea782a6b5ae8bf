"""Voxelization + geometry-eval dataset + synthetic scene tests."""

import numpy as np
import pytest

from giga_tpu.geometry.mesh import box_mesh
from giga_tpu.geometry.voxelize import voxelize_solid, voxelize_surface
from giga_tpu.utils.synthetic import icosphere, mesh_to_tsdf, random_scene


class TestVoxelize:
    def test_solid_box(self):
        m = box_mesh([0.5, 0.5, 0.5], center=(0.5, 0.5, 0.5))
        occ = voxelize_solid(m, 16, bounds=(np.zeros(3), np.ones(3)))
        frac = occ.mean()
        assert abs(frac - 0.125) < 0.03  # box fills 1/8 of the unit cube

    def test_exact_surface_superset_of_sampled(self):
        from giga_tpu.geometry.voxelize import _voxelize_surface_sampled
        from giga_tpu.utils.synthetic import icosphere

        m = icosphere(0.35, [0.5, 0.5, 0.5], 2)
        b = (np.zeros(3), np.ones(3))
        exact = voxelize_surface(m, 24, bounds=b)
        sampled = _voxelize_surface_sampled(m, 24, bounds=b, rng=np.random.RandomState(0))
        # SAT overlap is exact: every sampled-marked voxel must also be marked
        assert (~exact & sampled).sum() == 0
        assert exact.sum() >= sampled.sum() > 0

    def test_surface_is_shell(self):
        m = box_mesh([0.5, 0.5, 0.5], center=(0.5, 0.5, 0.5))
        surf = voxelize_surface(m, 16, bounds=(np.zeros(3), np.ones(3)),
                                rng=np.random.RandomState(0))
        solid = voxelize_solid(m, 16, bounds=(np.zeros(3), np.ones(3)))
        assert 0 < surf.sum() < solid.sum() * 3
        # surface voxels form a shell: strictly interior solid voxels are not all marked
        interior = solid & ~surf
        assert interior.sum() > 0


class TestSynthetic:
    def test_icosphere_geometry(self):
        s = icosphere(0.2, [0.1, 0.2, 0.3], subdivisions=2)
        r = np.linalg.norm(s.vertices - [0.1, 0.2, 0.3], axis=1)
        np.testing.assert_allclose(r, 0.2, atol=1e-9)
        assert abs(s.area - 4 * np.pi * 0.04) / (4 * np.pi * 0.04) < 0.05

    def test_tsdf_convention(self):
        rng = np.random.RandomState(0)
        mesh = random_scene(rng, 0.3, n_objects=2)
        tsdf = mesh_to_tsdf(mesh, 0.3, 32, rng=rng)
        assert tsdf.shape == (32, 32, 32)
        assert tsdf.min() >= 0.0 and tsdf.max() <= 1.0
        # far free space ~1, some interior below 0.5
        assert tsdf.max() > 0.95
        assert (tsdf < 0.4).sum() > 0


class TestGeometryEvalDataset:
    def test_dataset_items(self, tmp_path):
        from giga_tpu.core import io
        from giga_tpu.core.grasp import Grasp, Label
        from giga_tpu.core.perception import CameraIntrinsic
        from giga_tpu.core.transform import Rotation, Transform
        from giga_tpu.geometry.datasets import GeometryEvalDataset
        from giga_tpu.geometry.mesh import box_mesh

        root, raw = tmp_path / "proc", tmp_path / "raw"
        (root / "scenes").mkdir(parents=True)
        (raw / "mesh_pose_list").mkdir(parents=True)
        io.write_setup(raw, 0.3, CameraIntrinsic(64, 48, 54, 54, 32, 24), 0.08, 0.05)

        rng = np.random.RandomState(0)
        # one scene with a box mesh on disk, referenced via mesh_pose_list
        mesh = box_mesh([0.1, 0.1, 0.1], center=(0, 0, 0))
        mesh_path = tmp_path / "obj.obj"
        mesh.export(mesh_path)
        pose = np.eye(4)
        pose[:3, 3] = [0.15, 0.15, 0.05]
        mpl = np.asarray([(str(mesh_path), 1.0, pose)], dtype=object)
        np.savez(raw / "mesh_pose_list" / "s0.npz", pc=mpl)
        io.write_voxel_grid(root, "s0", rng.rand(1, 40, 40, 40).astype(np.float32))
        g = Grasp(Transform(Rotation.identity(), [0.15, 0.15, 0.05]), 0.04)
        io.write_grasp(raw, "s0", g, Label.SUCCESS)

        ds = GeometryEvalDataset(root, raw, num_point_occ=500, rng=rng)
        assert len(ds) == 1
        tsdf, points, occ, scene = ds[0]
        assert tsdf.shape == (40, 40, 40)
        assert points.shape == (500, 3)
        assert occ.dtype == bool and occ.sum() > 0
        assert len(scene.faces) == 12

"""Unit tests for host-side core types (transforms, grasps, IO)."""

import numpy as np
import pytest

from giga_tpu.core.grasp import Grasp, Label, from_voxel_coordinates, to_voxel_coordinates
from giga_tpu.core.transform import Rotation, Transform


def random_transform(rng):
    return Transform(Rotation.random(random_state=rng), rng.uniform(-1, 1, 3))


class TestTransform:
    def test_identity(self):
        t = Transform.identity()
        p = np.array([1.0, 2.0, 3.0])
        assert np.allclose(t.transform_point(p), p)

    def test_compose_matches_matrix_product(self):
        rng = np.random.RandomState(0)
        a, b = random_transform(rng), random_transform(rng)
        np.testing.assert_allclose((a * b).as_matrix(), a.as_matrix() @ b.as_matrix(), atol=1e-12)

    def test_inverse(self):
        rng = np.random.RandomState(1)
        t = random_transform(rng)
        np.testing.assert_allclose((t * t.inverse()).as_matrix(), np.eye(4), atol=1e-12)

    def test_roundtrips(self):
        rng = np.random.RandomState(2)
        t = random_transform(rng)
        for other in (
            Transform.from_matrix(t.as_matrix()),
            Transform.from_dict(t.to_dict()),
            Transform.from_list(t.to_list()),
        ):
            np.testing.assert_allclose(other.as_matrix(), t.as_matrix(), atol=1e-12)

    def test_look_at_points_camera_at_target(self):
        # camera above origin looking down; extrinsic maps world -> camera
        extr = Transform.look_at(eye=[0, 0, 1], center=[0, 0, 0], up=[0, 1, 0])
        target_cam = extr.transform_point([0.0, 0.0, 0.0])
        # target should be straight ahead on the +z camera axis at distance 1
        np.testing.assert_allclose(target_cam, [0, 0, 1], atol=1e-12)

    def test_transform_vector_ignores_translation(self):
        rng = np.random.RandomState(3)
        t = random_transform(rng)
        v = rng.uniform(-1, 1, 3)
        np.testing.assert_allclose(t.transform_vector(v), t.rotation.apply(v), atol=1e-12)


class TestGrasp:
    def test_voxel_coordinate_roundtrip(self):
        g = Grasp(Transform(Rotation.identity(), [0.1, 0.2, 0.3]), width=0.05)
        gv = to_voxel_coordinates(g, voxel_size=0.0075)
        gm = from_voxel_coordinates(gv, voxel_size=0.0075)
        np.testing.assert_allclose(gm.pose.translation, [0.1, 0.2, 0.3])
        assert gm.width == pytest.approx(0.05)
        # conversion must not mutate the original grasp
        np.testing.assert_allclose(g.pose.translation, [0.1, 0.2, 0.3])

    def test_labels(self):
        assert int(Label.FAILURE) == 0 and int(Label.SUCCESS) == 1


class TestIO:
    def test_grasp_csv_roundtrip(self, tmp_path):
        from giga_tpu.core import io

        rng = np.random.RandomState(4)
        g = Grasp(Transform(Rotation.random(random_state=rng), [0.1, 0.2, 0.3]), 0.04)
        io.write_grasp(tmp_path, "scene0", g, Label.SUCCESS)
        io.write_grasp(tmp_path, "scene1", g, Label.FAILURE)
        df = io.read_df(tmp_path)
        assert list(df.columns) == io.GRASP_CSV_COLUMNS
        scene_id, g2, label = io.read_grasp(df, 0)
        assert scene_id == "scene0" and label == 1
        np.testing.assert_allclose(g2.pose.translation, g.pose.translation, atol=1e-12)
        q1, q2 = g.pose.rotation.as_quat(), g2.pose.rotation.as_quat()
        assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-12

    def test_setup_json_roundtrip(self, tmp_path):
        from giga_tpu.core import io
        from giga_tpu.core.perception import CameraIntrinsic

        intrinsic = CameraIntrinsic(640, 480, 540.0, 540.0, 320.0, 240.0)
        io.write_setup(tmp_path, 0.3, intrinsic, 0.08, 0.05)
        size, intr, mow, fd = io.read_setup(tmp_path)
        assert size == 0.3 and mow == 0.08 and fd == 0.05
        np.testing.assert_allclose(intr.K, intrinsic.K)

    def test_voxel_grid_roundtrip(self, tmp_path):
        from giga_tpu.core import io

        (tmp_path / "scenes").mkdir()
        grid = np.random.RandomState(5).rand(1, 40, 40, 40).astype(np.float32)
        io.write_voxel_grid(tmp_path, "abc", grid)
        np.testing.assert_array_equal(io.read_voxel_grid(tmp_path, "abc"), grid)

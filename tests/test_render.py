"""Offscreen rasterizer: geometry, occlusion, native/numpy agreement, and the
affordance-image path (image-producing counterpart of reference
utils/visual.py's pyrender rendering)."""

import numpy as np
import pytest

from giga_tpu.core.perception import CameraIntrinsic
from giga_tpu.geometry import native
from giga_tpu.geometry.mesh import box_mesh
from giga_tpu.utils.render import (
    default_camera,
    render_affordance_image,
    render_mesh_image,
    save_image,
)

INTR = CameraIntrinsic(64, 48, 60.0, 60.0, 32.0, 24.0)


def _square(z, half=0.5, color=(200, 30, 30, 255)):
    """Two camera-frame triangles forming a square at depth z."""
    verts = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float64,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    colors = np.tile(np.array(color, np.uint8), (2, 1))
    return verts, faces, colors


def _raster(verts, faces, colors, **kw):
    return native.raster_mesh(
        verts, faces, colors, INTR.fx, INTR.fy, INTR.cx, INTR.cy,
        INTR.width, INTR.height, (255, 255, 255), **kw
    )


class TestKernel:
    def test_square_covers_center_not_corners(self):
        img = _raster(*_square(2.0))
        assert tuple(img[24, 32]) != (255, 255, 255)  # center hit
        assert tuple(img[0, 0]) == (255, 255, 255)  # corner is background
        # at z=2, half=0.5: projected half-extent = 60*0.5/2 = 15 px
        assert tuple(img[24, 32 - 14]) != (255, 255, 255)
        assert tuple(img[24, 32 - 17]) == (255, 255, 255)

    def test_zbuffer_near_wins(self):
        v1, f1, c1 = _square(2.0, color=(200, 0, 0, 255))
        v2, f2, c2 = _square(1.0, half=0.25, color=(0, 200, 0, 255))
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + 4])
        colors = np.concatenate([c1, c2])
        img = _raster(verts, faces, colors)
        r, g, b = img[24, 32]
        assert g > r  # nearer green square occludes
        # ... in either draw order
        img2 = _raster(
            np.concatenate([v2, v1]),
            np.concatenate([f2, f1 + 4]),
            np.concatenate([c2, c1]),
        )
        np.testing.assert_array_equal(img[24, 32], img2[24, 32])

    def test_translucent_blends_over_opaque(self):
        v1, f1, c1 = _square(2.0, color=(200, 0, 0, 255))
        v2, f2, c2 = _square(1.0, half=0.25, color=(0, 200, 0, 128))
        img = _raster(
            np.concatenate([v1, v2]),
            np.concatenate([f1, f2 + 4]),
            np.concatenate([c1, c2]),
        )
        r, g, b = img[24, 32].astype(int)
        assert r > 20 and g > 20  # both contribute

    def test_behind_camera_skipped(self):
        img = _raster(*_square(-1.0))
        assert np.all(img == 255)

    def test_native_matches_numpy_fallback(self):
        rng = np.random.RandomState(3)
        verts = rng.uniform(-0.5, 0.5, (30, 3))
        verts[:, 2] += 2.0
        faces = rng.randint(0, 30, (40, 3)).astype(np.int64)
        colors = rng.randint(0, 256, (40, 4)).astype(np.uint8)
        colors[:30, 3] = 255
        img_native = _raster(verts, faces, colors)
        assert native.get_lib() is not None
        img_np = native._raster_numpy(
            verts, faces, colors, INTR.fx, INTR.fy, INTR.cx, INTR.cy,
            INTR.width, INTR.height,
            np.full((INTR.height, INTR.width, 3), 255, np.uint8),
            0.35, 1e-4, np.array([0.0, 0.0, 1.0]),
        )
        # identical math either side; allow off-by-one from float rounding
        assert np.mean(np.abs(img_native.astype(int) - img_np.astype(int)) > 1) < 0.01


class TestScenePath:
    def test_render_mesh_image_world_frame(self):
        m = box_mesh([0.08, 0.08, 0.08], center=(0.15, 0.15, 0.04))
        img = render_mesh_image(m, size=0.3, intrinsic=INTR)
        assert img.shape == (48, 64, 3)
        assert np.any(np.any(img != 255, axis=-1))  # box visible

    def test_affordance_image_and_png(self, tmp_path):
        from giga_tpu.core.grasp import Grasp
        from giga_tpu.core.transform import Rotation, Transform

        m = box_mesh([0.08, 0.08, 0.08], center=(0.15, 0.15, 0.04))
        R = 10
        qual = np.zeros((R, R, R), np.float32)
        qual[4:6, 4:6, 1:3] = 0.9
        rot = np.zeros((R, R, R, 4), np.float32)
        rot[..., 3] = 1.0
        g = Grasp(Transform(Rotation.identity(), [0.15, 0.15, 0.1]), width=0.06)
        img = render_affordance_image(
            qual, rot, m, [g], [0.9], size=0.3, intrinsic=INTR, resolution=R
        )
        nonwhite = np.any(img != 255, axis=-1)
        assert nonwhite.mean() > 0.01
        # the green gripper glyph blends in somewhere
        greenish = (img[..., 1].astype(int) - img[..., 0].astype(int) > 30) & nonwhite
        assert greenish.any()

        out = tmp_path / "affordance.png"
        save_image(img, out)
        PIL = pytest.importorskip("PIL.Image")
        back = np.asarray(PIL.open(out))
        np.testing.assert_array_equal(back[..., :3], img)

    def test_minimal_png_encoder_roundtrip(self, tmp_path):
        from giga_tpu.utils.render import _write_png

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (20, 31, 3)).astype(np.uint8)
        out = tmp_path / "x.png"
        _write_png(img, out)
        PIL = pytest.importorskip("PIL.Image")
        back = np.asarray(PIL.open(out))
        np.testing.assert_array_equal(back, img)

    def test_logger_log_mesh_writes_png(self, tmp_path):
        from giga_tpu.experiments.clutter_removal import Logger

        logger = Logger(tmp_path, "visual")
        scene = box_mesh([0.08, 0.08, 0.08], center=(0.15, 0.15, 0.04))
        aff = scene.copy()
        aff.face_colors = np.tile(
            np.array([200, 40, 40, 255], np.uint8), (len(aff.faces), 1)
        )
        logger.log_mesh(scene, aff, "round_000_trial_000")
        mesh_dir = logger.logdir / "meshes"
        assert (mesh_dir / "round_000_trial_000_aff.png").exists()
        PIL = pytest.importorskip("PIL.Image")
        img = np.asarray(PIL.open(mesh_dir / "round_000_trial_000_aff.png"))
        assert np.any(np.any(img[..., :3] != 255, axis=-1))

    def test_software_rollout_renderer(self, tmp_path):
        """render_rollouts fallback: snapshot pickles -> PNG frames."""
        import pickle

        from giga_tpu.core.transform import Rotation, Transform
        from giga_tpu.utils.render import SoftwareRenderer

        obj = tmp_path / "box.obj"
        box_mesh([0.06, 0.06, 0.06]).export(obj)
        rollout = tmp_path / "round_000"
        rollout.mkdir()
        for i, x in enumerate((0.10, 0.20)):
            snap = {
                "2_-1": (str(obj), [1.0, 1.0, 1.0],
                         Transform(Rotation.identity(), [x, 0.15, 0.03])),
            }
            with open(rollout / f"{i:04d}.pkl", "wb") as f:
                pickle.dump(snap, f)

        r = SoftwareRenderer(width=96, height=64)
        r.render_rollout(rollout, tmp_path / "frames")
        r.close()
        frames = sorted((tmp_path / "frames").glob("*.png"))
        assert len(frames) == 2
        PIL = pytest.importorskip("PIL.Image")
        img0 = np.asarray(PIL.open(frames[0]))
        img1 = np.asarray(PIL.open(frames[1]))
        assert np.any(np.any(img0[..., :3] != 255, axis=-1))
        assert not np.array_equal(img0, img1)  # the box moved

    def test_default_camera_looks_at_workspace(self):
        ext = default_camera(0.3)
        center_cam = ext.transform_point(np.r_[0.15, 0.15, 0.075])
        assert center_cam[2] > 0  # center in front of the camera
        # and near the optical axis
        assert abs(center_cam[0]) < 0.05 and abs(center_cam[1]) < 0.05

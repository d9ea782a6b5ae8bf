"""TSDF fusion tests: fuse synthetic depth images of known geometry and check
the reconstructed signed-distance band, multi-view averaging, and surface
extraction."""

import numpy as np
import pytest

import jax.numpy as jnp

from giga_tpu.core.perception import CameraIntrinsic, TSDFVolume, camera_on_sphere, create_tsdf
from giga_tpu.core.transform import Rotation, Transform
from giga_tpu.ops.tsdf import fuse_views


SIZE = 0.3
RES = 40
INTR = CameraIntrinsic(160, 120, 135.0, 135.0, 80.0, 60.0)


def overhead_camera(height=0.6):
    """Camera straight above the workspace center looking down (+z world up)."""
    eye = np.array([SIZE / 2, SIZE / 2 + 1e-6, height])
    center = np.array([SIZE / 2, SIZE / 2, 0.0])
    return Transform.look_at(eye, center, up=np.array([0.0, 1.0, 0.0]))


def render_plane_depth(extrinsic, plane_z, intr=INTR):
    """Depth image of the infinite plane z = plane_z seen by the camera."""
    T_cam_world = extrinsic
    T_world_cam = extrinsic.inverse()
    cam_origin = T_world_cam.translation
    us, vs = np.meshgrid(np.arange(intr.width), np.arange(intr.height))
    dirs_cam = np.stack(
        [(us - intr.cx) / intr.fx, (vs - intr.cy) / intr.fy, np.ones_like(us, float)], axis=-1
    )
    dirs_world = T_world_cam.rotation.apply(dirs_cam.reshape(-1, 3)).reshape(dirs_cam.shape)
    # ray: o + t*d hits z = plane_z -> t = (plane_z - oz) / dz
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (plane_z - cam_origin[2]) / dirs_world[..., 2]
    depth = np.where(t > 0, t, 0.0)  # z-depth: t is the camera-z multiplier
    return depth.astype(np.float32)


class TestTSDFIntegration:
    def test_flat_plane_band(self):
        """Fusing a top-down view of the z=0.1 plane must yield ~1 above the
        plane + trunc, ~0.5 at the plane, low values just below."""
        extr = overhead_camera()
        depth = render_plane_depth(extr, plane_z=0.1)
        tsdf = TSDFVolume(SIZE, RES)
        tsdf.integrate(depth, INTR, extr)
        grid = tsdf.get_grid()[0]
        vs = tsdf.voxel_size

        # voxel centers at z = (k + 0.5) * vs; plane at z=0.1 -> k ~ 12.8
        mid = RES // 2
        col = grid[mid, mid, :]
        k_plane = int(0.1 / vs - 0.5)
        # well above the plane (observed free space): ~1
        assert col[k_plane + 6] > 0.95
        # near the plane: around 0.5
        band = col[k_plane : k_plane + 2]
        assert np.all(band > 0.2) and np.all(band < 0.8)
        # unobserved (occluded below plane beyond truncation): 0
        assert col[max(k_plane - 6, 0)] == 0.0

    def test_weight_accumulates_and_mean_stable(self):
        extr = overhead_camera()
        depth = render_plane_depth(extr, plane_z=0.1)
        tsdf = TSDFVolume(SIZE, RES)
        tsdf.integrate(depth, INTR, extr)
        g1 = tsdf.get_grid().copy()
        tsdf.integrate(depth, INTR, extr)
        g2 = tsdf.get_grid()
        np.testing.assert_allclose(g1, g2, atol=1e-6)  # same view twice -> same mean

    def test_fuse_views_matches_sequential(self):
        extrs = []
        depths = []
        origin = Transform(Rotation.identity(), np.r_[SIZE / 2, SIZE / 2, 0.0])
        for phi in (0.0, 2.0, 4.0):
            e = camera_on_sphere(origin, radius=2 * SIZE, theta=np.pi / 6, phi=phi)
            extrs.append(e)
            depths.append(render_plane_depth(e, plane_z=0.05))
        seq = create_tsdf(SIZE, RES, np.stack(depths), INTR, np.stack([e.to_list() for e in extrs]))
        fused, weight = fuse_views(
            jnp.stack([jnp.asarray(d) for d in depths]),
            jnp.asarray(INTR.K, jnp.float32),
            jnp.stack([jnp.asarray(e.as_matrix(), jnp.float32) for e in extrs]),
            resolution=RES,
            size=SIZE,
            sdf_trunc=4 * SIZE / RES,
        )
        np.testing.assert_allclose(seq.get_grid()[0], np.asarray(fused), atol=1e-5)

    def test_surface_extraction_finds_plane(self):
        extr = overhead_camera()
        depth = render_plane_depth(extr, plane_z=0.12)
        tsdf = TSDFVolume(SIZE, 60)
        tsdf.integrate(depth, INTR, extr)
        pts = tsdf.get_cloud()
        assert len(pts) > 100
        # extracted surface points should hug z = 0.12
        z = pts[:, 2]
        assert abs(np.median(z) - 0.12) < 0.01

    def test_depth_trunc_ignores_far_pixels(self):
        extr = overhead_camera(height=2.5)  # plane at distance > 2m
        depth = render_plane_depth(extr, plane_z=0.0)
        tsdf = TSDFVolume(SIZE, RES)
        tsdf.integrate(depth, INTR, extr)
        assert np.all(tsdf.get_grid() == 0.0)


class TestSurfaceNormals:
    def test_boundary_normals_ignore_unobserved(self):
        """Unobserved voxels store 0 ('deeply inside'); the normal gradient
        must not leak sideways into the unobserved region at observation
        boundaries (those normals orient grasp approach directions in
        scripts/generate_data_parallel.py)."""
        from giga_tpu.ops.tsdf import extract_surface_points

        R = 24
        z = (np.arange(R) + 0.5) / R
        tsdf = np.broadcast_to(
            np.clip((z[None, None, :] - 0.5) * 8 + 0.5, 0, 1), (R, R, R)
        ).astype(np.float32).copy()
        w = np.ones((R, R, R), np.float32)
        w[R // 2:] = 0.0
        tsdf[R // 2:] = 0.0  # storage convention for unobserved
        pts, nrm = extract_surface_points(tsdf, w, 0.3 / R, with_normals=True)
        assert len(pts)
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-6)
        assert (nrm[:, 2] > 0.9).all(), "boundary normals leaked sideways"

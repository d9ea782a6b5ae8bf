"""Camera model and TSDF perception (reference: src/vgn/perception.py:10-137).

The depth->TSDF fusion itself runs on device as a jitted JAX kernel
(giga_tpu.ops.tsdf) — replacing both Open3D's UniformTSDFVolume.integrate and
the reference's ~35 ms Python voxel-extraction loop (perception.py:107-115).
The classes here are thin host-side state holders around that kernel.

TSDF value convention (matches what the reference planner consumes from
Open3D's voxel colors): values live in [0, 1], where 0.5 is the surface,
values > 0.5 are in observed free space, values < 0.5 are behind the
surface, and exactly 0 means "never observed".
"""

from __future__ import annotations

from math import cos, sin

import numpy as np

from giga_tpu.core.transform import Transform


class CameraIntrinsic:
    """Pinhole camera intrinsics."""

    def __init__(self, width, height, fx, fy, cx, cy):
        self.width = width
        self.height = height
        self.K = np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    def to_dict(self):
        return {
            "width": self.width,
            "height": self.height,
            "K": self.K.flatten().tolist(),
        }

    @classmethod
    def from_dict(cls, data):
        return cls(
            width=data["width"],
            height=data["height"],
            fx=data["K"][0],
            fy=data["K"][4],
            cx=data["K"][2],
            cy=data["K"][5],
        )


class TSDFVolume:
    """Uniform TSDF over a cubic workspace [0, size]^3, fused on device.

    Args:
        size: metric edge length of the cube.
        resolution: voxels per edge.
    """

    def __init__(self, size: float, resolution: int):
        self.size = float(size)
        self.resolution = int(resolution)
        self.voxel_size = self.size / self.resolution
        self.sdf_trunc = 4 * self.voxel_size
        # running weighted mean state; lazily moved to device by the fusion op
        self._tsdf = np.zeros((resolution,) * 3, dtype=np.float32)
        self._weight = np.zeros((resolution,) * 3, dtype=np.float32)

    def integrate(self, depth_img, intrinsic: CameraIntrinsic, extrinsic: Transform) -> None:
        """Fuse one depth image. ``extrinsic`` maps task (TSDF) frame -> camera frame."""
        from giga_tpu.ops.tsdf import integrate_tsdf

        self._tsdf, self._weight = integrate_tsdf(
            self._tsdf,
            self._weight,
            np.ascontiguousarray(depth_img, dtype=np.float32),
            np.asarray(intrinsic.K, dtype=np.float32),
            np.asarray(extrinsic.as_matrix(), dtype=np.float32),
            size=self.size,
            sdf_trunc=self.sdf_trunc,
        )

    def get_grid(self) -> np.ndarray:
        """Return the (1, R, R, R) float32 grid the planner consumes."""
        return np.asarray(self._tsdf)[None].astype(np.float32)

    def get_cloud(self, with_normals: bool = False):
        """Extract an (N, 3) surface point cloud at the 0.5 iso-level
        (optionally with outward unit normals from the TSDF gradient)."""
        from giga_tpu.ops.tsdf import extract_surface_points

        return extract_surface_points(
            np.asarray(self._tsdf), np.asarray(self._weight), self.voxel_size,
            with_normals=with_normals,
        )


def create_tsdf(size, resolution, depth_imgs, intrinsic, extrinsics) -> TSDFVolume:
    """Fuse a stack of depth images (reference: perception.py:121-126)."""
    tsdf = TSDFVolume(size, resolution)
    for i in range(depth_imgs.shape[0]):
        extrinsic = Transform.from_list(extrinsics[i])
        tsdf.integrate(depth_imgs[i], intrinsic, extrinsic)
    return tsdf


def camera_on_sphere(origin: Transform, radius, theta, phi) -> Transform:
    """Extrinsic for a camera on a sphere around ``origin`` looking at its center."""
    eye = np.r_[
        radius * sin(theta) * cos(phi),
        radius * sin(theta) * sin(phi),
        radius * cos(theta),
    ]
    target = np.array([0.0, 0.0, 0.0])
    up = np.array([0.0, 0.0, 1.0])  # breaks when looking straight down
    return Transform.look_at(eye, target, up) * origin.inverse()

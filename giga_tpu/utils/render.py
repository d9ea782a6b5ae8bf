"""Offscreen image rendering of scenes / affordance visuals.

The reference renders affordance imagery with pyrender offscreen GL
(reference src/vgn/utils/visual.py:21-99: compose colored scene + gripper
glyphs, render from an orbiting camera) and rollout videos with NViSII.
This module produces the same imagery with giga_tpu's own z-buffer
rasterizer (geometry/csrc/raster.cpp) — no GL stack or GPU required:

    img = render_affordance_image(qual_vol, rot_vol, scene_mesh, grasps, scores)
    save_image(img, "affordance.png")
"""

from __future__ import annotations

import numpy as np

from giga_tpu.core.perception import CameraIntrinsic, camera_on_sphere
from giga_tpu.core.transform import Rotation, Transform
from giga_tpu.geometry.mesh import TriMesh
from giga_tpu.geometry.native import raster_mesh
from giga_tpu.utils.visual import affordance_visual, compose_scene

DEFAULT_INTRINSIC = CameraIntrinsic(640, 480, 540.0, 540.0, 320.0, 240.0)


def default_camera(size: float = 0.3, radius_scale: float = 2.2,
                   theta: float = np.pi / 4.0, phi: float = -np.pi / 2.0) -> Transform:
    """World->camera extrinsic orbiting the workspace center, matching the
    viewpoint convention of the sim's round-capture cameras
    (reference simulation.py acquire_tsdf: camera_on_sphere over the
    workspace center)."""
    center = Transform(Rotation.identity(), np.r_[size / 2, size / 2, size / 4])
    return camera_on_sphere(center, radius_scale * size, theta, phi)


def render_mesh_image(mesh: TriMesh, extrinsic: Transform | None = None,
                      intrinsic: CameraIntrinsic = DEFAULT_INTRINSIC,
                      size: float = 0.3, background=(255, 255, 255),
                      ambient: float = 0.35) -> np.ndarray:
    """Rasterize a (possibly face-colored) world-frame mesh -> (H, W, 3) uint8."""
    if extrinsic is None:
        extrinsic = default_camera(size)
    verts = np.asarray(mesh.vertices, np.float64)
    if len(verts):
        verts_cam = verts @ extrinsic.rotation.as_matrix().T + extrinsic.translation
    else:
        verts_cam = verts.reshape(0, 3)
    colors = getattr(mesh, "face_colors", None)
    if colors is None:
        colors = np.tile(np.array([180, 180, 190, 255], np.uint8),
                         (len(mesh.faces), 1))
    colors = np.asarray(colors)
    if colors.shape[-1] == 3:
        colors = np.concatenate(
            [colors, np.full((len(colors), 1), 255, colors.dtype)], axis=-1
        )
    return raster_mesh(
        verts_cam, mesh.faces, colors,
        intrinsic.fx, intrinsic.fy, intrinsic.cx, intrinsic.cy,
        intrinsic.width, intrinsic.height, background, ambient=ambient,
    )


def render_affordance_image(qual_vol, rot_vol, scene_mesh: TriMesh,
                            grasps=(), scores=(), size: float = 0.3,
                            extrinsic: Transform | None = None,
                            intrinsic: CameraIntrinsic = DEFAULT_INTRINSIC,
                            **aff_kwargs) -> np.ndarray:
    """Affordance-colored scene + gripper glyphs -> rendered RGB image
    (image-producing counterpart of utils/visual.py's colored-PLY path)."""
    colored = affordance_visual(qual_vol, rot_vol, scene_mesh, size=size,
                                **aff_kwargs)
    composed = compose_scene(colored, list(grasps), list(scores))
    return render_mesh_image(composed, extrinsic, intrinsic, size=size)


def save_image(img: np.ndarray, path) -> None:
    """Write an (H, W, 3) uint8 array as PNG (PIL when present, else a
    minimal self-contained PNG encoder)."""
    img = np.ascontiguousarray(img, np.uint8)
    try:
        from PIL import Image

        Image.fromarray(img).save(str(path))
        return
    except ImportError:
        pass
    _write_png(img, path)


def _write_png(img: np.ndarray, path) -> None:
    import struct
    import zlib

    h, w = img.shape[:2]

    def chunk(tag, data):
        out = struct.pack(">I", len(data)) + tag + data
        return out + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", header))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))

"""Build + load the native geometry kernels (ctypes over a g++-compiled .so).

The C++ sources under ``csrc/`` are compiled once on first use into
``_native.so`` next to this file (rebuilt when any source is newer). A pure
numpy fallback covers environments without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC_DIR = _HERE / "csrc"
_LIB_PATH = _HERE / "_native.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    sources = sorted(_SRC_DIR.glob("*.cpp"))
    if not sources:
        return False
    if _LIB_PATH.exists() and all(
        _LIB_PATH.stat().st_mtime >= s.stat().st_mtime for s in sources
    ):
        return True
    # build to a per-process temp name + atomic rename: mp.Pool workers (the
    # *_parallel.py data scripts) may race this build, and a reader must
    # never CDLL a half-written .so
    tmp = _LIB_PATH.with_suffix(f".so.tmp{os.getpid()}")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *map(str, sources), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        tmp.unlink(missing_ok=True)
        return False


def get_lib():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _build():
            _build_failed = True
            return None
        try:
            _lib = _load_and_bind()
        except (OSError, AttributeError):
            # corrupt/stale .so (e.g. an interrupted build): engage the
            # numpy fallbacks instead of crashing every consumer
            _build_failed = True
        return _lib


def _load_and_bind():
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mesh_contains.restype = ctypes.c_int
    lib.mesh_contains.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.marching_tetrahedra.restype = ctypes.c_int
    lib.marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.marching_tetrahedra_cells.restype = ctypes.c_int
    lib.marching_tetrahedra_cells.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.free_mesh_buffers.restype = None
    lib.free_mesh_buffers.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.voxelize_surface_exact.restype = ctypes.c_int
    lib.voxelize_surface_exact.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.raster_mesh.restype = ctypes.c_int
    lib.raster_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
    ]
    lib.simplify_mesh.restype = ctypes.c_int
    lib.simplify_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def check_mesh_contains(mesh, points: np.ndarray) -> np.ndarray:
    """(N,) bool: is each point inside the (assumed watertight) mesh?

    Native equivalent of the reference's libmesh check_mesh_contains
    (ConvONets/utils/libmesh, used at utils/implicit.py:87).
    """
    points = np.ascontiguousarray(points, dtype=np.float64).reshape(-1, 3)
    verts = np.ascontiguousarray(mesh.vertices, dtype=np.float64)
    faces = np.ascontiguousarray(mesh.faces, dtype=np.int64)
    n = len(points)
    if len(faces) == 0 or n == 0:
        return np.zeros(n, dtype=bool)

    lib = get_lib()
    if lib is not None:
        out = np.zeros(n, dtype=np.uint8)
        rc = lib.mesh_contains(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out.astype(bool)
    return _contains_numpy(verts, faces, points)


def marching_tetrahedra(grid: np.ndarray, iso: float):
    """Isosurface of a dense (nx, ny, nz) grid -> (vertices, faces).

    Vertices are in index coordinates. Triangles wind so normals point toward
    lower field values (outward for occupancy grids). Role of the reference's
    libmcubes.marching_cubes (generation.py:374-379), via tetrahedra.
    """
    grid = np.ascontiguousarray(grid, dtype=np.float64)
    nx, ny, nz = grid.shape
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native geometry kernel unavailable (g++ build failed)")
    verts_p = ctypes.POINTER(ctypes.c_double)()
    tris_p = ctypes.POINTER(ctypes.c_int64)()
    nverts = ctypes.c_int64()
    ntris = ctypes.c_int64()
    rc = lib.marching_tetrahedra(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nx, ny, nz,
        float(iso),
        ctypes.byref(verts_p), ctypes.byref(nverts),
        ctypes.byref(tris_p), ctypes.byref(ntris),
    )
    if rc != 0:
        raise MemoryError("marching_tetrahedra allocation failed")
    try:
        nv, nt = nverts.value, ntris.value
        verts = np.ctypeslib.as_array(verts_p, shape=(nv * 3,)).copy().reshape(nv, 3) if nv else np.zeros((0, 3))
        tris = np.ctypeslib.as_array(tris_p, shape=(nt * 3,)).copy().reshape(nt, 3) if nt else np.zeros((0, 3), np.int64)
    finally:
        lib.free_mesh_buffers(verts_p, tris_p)
    return verts, tris


def raster_mesh(verts_cam: np.ndarray, faces: np.ndarray, face_colors: np.ndarray,
                fx: float, fy: float, cx: float, cy: float,
                width: int, height: int, background,
                ambient: float = 0.35, znear: float = 1e-4,
                light=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Z-buffered flat-shaded rasterization -> (H, W, 3) uint8 image.

    ``verts_cam`` are camera-frame positions (+z forward); ``face_colors``
    is (F, 4) RGBA (alpha<255 faces blend over the opaque pass). Native
    stand-in for pyrender offscreen rendering (reference utils/visual.py).
    Falls back to a numpy per-face loop without a toolchain.
    """
    verts_cam = np.ascontiguousarray(verts_cam, dtype=np.float64).reshape(-1, 3)
    faces = np.ascontiguousarray(faces, dtype=np.int64).reshape(-1, 3)
    face_colors = np.ascontiguousarray(face_colors, dtype=np.uint8).reshape(-1, 4)
    assert len(face_colors) == len(faces)
    img = np.empty((height, width, 3), np.uint8)
    img[:] = np.asarray(background, np.uint8)
    if len(faces) == 0:
        return img
    light_arr = np.ascontiguousarray(light, dtype=np.float64)

    lib = get_lib()
    if lib is not None:
        zbuf = np.empty((height, width), np.float64)
        rc = lib.raster_mesh(
            verts_cam.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts_cam),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
            face_colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            float(fx), float(fy), float(cx), float(cy),
            int(width), int(height), float(ambient), float(znear),
            light_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            zbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc == 0:
            return img
    return _raster_numpy(verts_cam, faces, face_colors, fx, fy, cx, cy,
                         width, height, img, ambient, znear, light_arr)


def _raster_numpy(verts_cam, faces, face_colors, fx, fy, cx, cy,
                  width, height, img, ambient, znear, light):
    """Per-face numpy fallback mirroring raster.cpp (slow, small meshes)."""
    L = light / max(np.linalg.norm(light), 1e-12)
    zbuf = np.full((height, width), np.inf)
    tri_all = verts_cam[faces]  # (F, 3, 3)
    order = np.concatenate(
        [np.flatnonzero(face_colors[:, 3] == 255),
         np.flatnonzero(face_colors[:, 3] < 255)]
    )
    for f in order:
        tri = tri_all[f]
        if np.any(tri[:, 2] <= znear):
            continue
        su = fx * tri[:, 0] / tri[:, 2] + cx
        sv = fy * tri[:, 1] / tri[:, 2] + cy
        sz = 1.0 / tri[:, 2]
        area = (su[1] - su[0]) * (sv[2] - sv[0]) - (sv[1] - sv[0]) * (su[2] - su[0])
        if abs(area) < 1e-12:
            continue
        n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
        n /= max(np.linalg.norm(n), 1e-300)
        shade = ambient + (1 - ambient) * abs(float(n @ L))
        rgb = face_colors[f, :3].astype(np.float64) * shade
        a01 = face_colors[f, 3] / 255.0
        x0 = max(int(np.floor(su.min())), 0)
        x1 = min(int(np.ceil(su.max())), width - 1)
        y0 = max(int(np.floor(sv.min())), 0)
        y1 = min(int(np.ceil(sv.max())), height - 1)
        if x1 < x0 or y1 < y0:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1) + 0.5,
                             np.arange(y0, y1 + 1) + 0.5)
        w0 = ((su[1] - xs) * (sv[2] - ys) - (sv[1] - ys) * (su[2] - xs)) / area
        w1 = ((su[2] - xs) * (sv[0] - ys) - (sv[2] - ys) * (su[0] - xs)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = 1.0 / (w0 * sz[0] + w1 * sz[1] + w2 * sz[2])
        sub_z = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        sub_img = img[y0 : y1 + 1, x0 : x1 + 1]
        if a01 >= 1.0:
            upd = inside & (z < sub_z)
            sub_z[upd] = z[upd]
            sub_img[upd] = (rgb + 0.5).astype(np.uint8)
        else:
            upd = inside & (z <= sub_z)
            sub_img[upd] = (
                a01 * rgb + (1 - a01) * sub_img[upd] + 0.5
            ).astype(np.uint8)
    return img


def marching_tetrahedra_cells(cell_ids: np.ndarray, corner_vals: np.ndarray,
                              shape, iso: float):
    """Sparse isosurface: triangulate only the listed cells -> (verts, faces).

    ``cell_ids`` are flat indices into the (nx-1, ny-1, nz-1) cell lattice of
    a conceptual (nx, ny, nz) = ``shape`` grid; ``corner_vals`` is
    (ncells, 8) in cube-corner order (bit 0 -> +x, 1 -> +y, 2 -> +z).
    Vertices are in grid index coordinates, wound outward (toward lower
    values), with winding determined locally per tetrahedron.
    """
    cell_ids = np.ascontiguousarray(cell_ids, dtype=np.int64).reshape(-1)
    corner_vals = np.ascontiguousarray(corner_vals, dtype=np.float64).reshape(-1, 8)
    assert len(cell_ids) == len(corner_vals)
    nx, ny, nz = shape
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native geometry kernel unavailable (g++ build failed)")
    verts_p = ctypes.POINTER(ctypes.c_double)()
    tris_p = ctypes.POINTER(ctypes.c_int64)()
    nverts = ctypes.c_int64()
    ntris = ctypes.c_int64()
    rc = lib.marching_tetrahedra_cells(
        cell_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        corner_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(cell_ids), nx, ny, nz, float(iso),
        ctypes.byref(verts_p), ctypes.byref(nverts),
        ctypes.byref(tris_p), ctypes.byref(ntris),
    )
    if rc != 0:
        raise MemoryError("marching_tetrahedra_cells allocation failed")
    try:
        nv, nt = nverts.value, ntris.value
        verts = np.ctypeslib.as_array(verts_p, shape=(nv * 3,)).copy().reshape(nv, 3) if nv else np.zeros((0, 3))
        tris = np.ctypeslib.as_array(tris_p, shape=(nt * 3,)).copy().reshape(nt, 3) if nt else np.zeros((0, 3), np.int64)
    finally:
        lib.free_mesh_buffers(verts_p, tris_p)
    return verts, tris


def simplify_mesh(mesh, target_faces: int, aggressiveness: float = 7.0):
    """Quadric-error-metric decimation -> new (vertices, faces).

    Role of the reference's libsimplify (generation.py:417-420). Best-effort:
    stops early if no more collapses pass the flip check.
    """
    verts = np.ascontiguousarray(mesh.vertices, dtype=np.float64)
    faces = np.ascontiguousarray(mesh.faces, dtype=np.int64)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native geometry kernel unavailable (g++ build failed)")
    overts_p = ctypes.POINTER(ctypes.c_double)()
    ofaces_p = ctypes.POINTER(ctypes.c_int64)()
    onv = ctypes.c_int64()
    onf = ctypes.c_int64()
    rc = lib.simplify_mesh(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
        int(target_faces), float(aggressiveness),
        ctypes.byref(overts_p), ctypes.byref(onv),
        ctypes.byref(ofaces_p), ctypes.byref(onf),
    )
    if rc != 0:
        raise MemoryError("simplify_mesh allocation failed")
    try:
        nv, nf2 = onv.value, onf.value
        out_v = np.ctypeslib.as_array(overts_p, shape=(nv * 3,)).copy().reshape(nv, 3) if nv else np.zeros((0, 3))
        out_f = np.ctypeslib.as_array(ofaces_p, shape=(nf2 * 3,)).copy().reshape(nf2, 3) if nf2 else np.zeros((0, 3), np.int64)
    finally:
        lib.free_mesh_buffers(overts_p, ofaces_p)
    return out_v, out_f


def _contains_numpy(verts, faces, points, chunk: int = 2048) -> np.ndarray:
    """Vectorized numpy fallback: +z ray stabbing without spatial hashing."""
    tri = verts[faces]  # (F, 3, 3)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    v0 = b[:, :2] - a[:, :2]
    v1 = c[:, :2] - a[:, :2]
    det = v0[:, 0] * v1[:, 1] - v0[:, 1] * v1[:, 0]
    ok = np.abs(det) > 1e-300
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)

    out = np.zeros(len(points), dtype=bool)
    for s in range(0, len(points), chunk):
        p = points[s : s + chunk]
        q = p[:, None, :2] - a[None, :, :2]  # (P, F, 2)
        u = (q[..., 0] * v1[:, 1] - q[..., 1] * v1[:, 0]) * inv_det
        v = (v0[:, 0] * q[..., 1] - v0[:, 1] * q[..., 0]) * inv_det
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1)
        z = a[:, 2] + u * (b[:, 2] - a[:, 2]) + v * (c[:, 2] - a[:, 2])
        above = hit & (z > p[:, None, 2])
        out[s : s + chunk] = (above.sum(axis=1) % 2).astype(bool)
    return out

"""Mesh voxelization (role of the reference's libvoxelize + ConvONets
VoxelGrid utils).

``voxelize_solid``: interior occupancy on voxel centers via the native
containment kernel. ``voxelize_surface``: conservative surface occupancy by
stratified triangle sampling (each triangle contributes samples at
sub-voxel density, marking every voxel it touches) — same role as the
reference's tribox-overlap test without a dedicated C++ kernel.
"""

from __future__ import annotations

import numpy as np

from giga_tpu.geometry.mesh import TriMesh
from giga_tpu.geometry.native import check_mesh_contains


def voxelize_solid(mesh: TriMesh, resolution: int, bounds=None) -> np.ndarray:
    """(R, R, R) bool: voxel centers inside the (watertight) mesh."""
    lo, hi = _bounds(mesh, bounds)
    lin = [lo[d] + (np.arange(resolution) + 0.5) * (hi[d] - lo[d]) / resolution for d in range(3)]
    centers = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    occ = check_mesh_contains(mesh, centers)
    return occ.reshape(resolution, resolution, resolution)


def voxelize_surface(mesh: TriMesh, resolution: int, bounds=None, rng=None) -> np.ndarray:
    """(R, R, R) bool: voxels intersected by the mesh surface.

    Exact triangle/box SAT overlap in C++ (tribox role); falls back to
    sampling-based marking without a native build.
    """
    import ctypes

    from giga_tpu.geometry.native import get_lib

    lib = get_lib()
    if lib is not None and not mesh.is_empty():
        lo, hi = _bounds(mesh, bounds)
        verts = np.ascontiguousarray(mesh.vertices, np.float64)
        faces = np.ascontiguousarray(mesh.faces, np.int64)
        out = np.zeros(resolution**3, np.uint8)
        lo_a = np.ascontiguousarray(lo, np.float64)
        hi_a = np.ascontiguousarray(hi, np.float64)
        rc = lib.voxelize_surface_exact(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
            resolution,
            lo_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            hi_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out.astype(bool).reshape(resolution, resolution, resolution)
    return _voxelize_surface_sampled(mesh, resolution, bounds, rng=rng)


def _voxelize_surface_sampled(mesh: TriMesh, resolution: int, bounds=None,
                              samples_per_voxel_area: float = 4.0, rng=None) -> np.ndarray:
    """Sampling fallback: stratified surface samples mark touched voxels."""
    rng = rng or np.random
    lo, hi = _bounds(mesh, bounds)
    cell = (hi - lo) / resolution
    min_cell = float(np.min(cell))
    if mesh.is_empty():
        return np.zeros((resolution,) * 3, bool)
    # enough samples that every voxel a triangle crosses receives one
    n = int(np.ceil(samples_per_voxel_area * mesh.area / max(min_cell**2, 1e-12)))
    n = int(np.clip(n, 1000, 4_000_000))
    pts, _ = mesh.sample_surface(n, rng=rng)
    # corners too: guarantee thin features register
    pts = np.concatenate([pts, mesh.vertices])
    idx = np.floor((pts - lo) / cell).astype(int)
    valid = np.all((idx >= 0) & (idx < resolution), axis=1)
    idx = idx[valid]
    out = np.zeros((resolution,) * 3, bool)
    out[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return out


def _bounds(mesh: TriMesh, bounds):
    if bounds is not None:
        return np.asarray(bounds[0], float), np.asarray(bounds[1], float)
    b = mesh.bounds
    return b[0], b[1]

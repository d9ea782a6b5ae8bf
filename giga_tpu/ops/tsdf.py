"""Projective TSDF fusion as jitted JAX kernels.

Replaces the reference's Open3D ``UniformTSDFVolume.integrate`` plus the
Python voxel-readout loop (reference: src/vgn/perception.py:63-118, noted
there as "~35 ms / 50 ms of the whole pipeline"). Per-voxel fusion is a pure
map over the grid — ideal for the VPU — and the whole multi-view fusion stays
on device with no host round-trips.

Value convention: stored TSDF in [0, 1]; 0.5 = surface; 0 = unobserved
(weight 0). Internally the signed distance f in [-1, 1] is stored as
(f + 1) / 2 so that the planner-facing grid matches what the reference reads
out of Open3D voxel colors (detection_implicit.py masks with
``tsdf > 0.5`` / ``1e-3 < tsdf < 0.5``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("size", "sdf_trunc", "depth_trunc"))
def integrate_tsdf(
    tsdf: jax.Array,
    weight: jax.Array,
    depth_img: jax.Array,
    K: jax.Array,
    extrinsic: jax.Array,
    *,
    size: float,
    sdf_trunc: float,
    depth_trunc: float = 2.0,
):
    """Fuse one depth image into a running (tsdf, weight) pair.

    Args:
        tsdf: (R, R, R) stored values in [0, 1].
        weight: (R, R, R) observation counts.
        depth_img: (H, W) metric depth; 0 = invalid.
        K: (3, 3) intrinsics.
        extrinsic: (4, 4) task-frame -> camera-frame transform.
        size: cube edge length; voxel centers at (i + 0.5) * size / R.
    Returns:
        (tsdf, weight) updated.
    """
    res = tsdf.shape[0]
    voxel_size = size / res
    H, W = depth_img.shape

    # voxel centers in the task frame
    idx = (jnp.arange(res, dtype=jnp.float32) + 0.5) * voxel_size
    px = idx[:, None, None]
    py = idx[None, :, None]
    pz = idx[None, None, :]

    R_cw = extrinsic[:3, :3]
    t_cw = extrinsic[:3, 3]
    # camera-frame coordinates of every voxel center
    cx_ = R_cw[0, 0] * px + R_cw[0, 1] * py + R_cw[0, 2] * pz + t_cw[0]
    cy_ = R_cw[1, 0] * px + R_cw[1, 1] * py + R_cw[1, 2] * pz + t_cw[1]
    cz_ = R_cw[2, 0] * px + R_cw[2, 1] * py + R_cw[2, 2] * pz + t_cw[2]

    # project to pixel coordinates (nearest-neighbor depth lookup)
    u = jnp.round(K[0, 0] * cx_ / cz_ + K[0, 2]).astype(jnp.int32)
    v = jnp.round(K[1, 1] * cy_ / cz_ + K[1, 2]).astype(jnp.int32)
    in_frustum = (cz_ > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)

    u_safe = jnp.clip(u, 0, W - 1)
    v_safe = jnp.clip(v, 0, H - 1)
    d = depth_img[v_safe, u_safe]
    valid_depth = (d > 0) & (d <= depth_trunc)

    sdf = d - cz_
    observed = in_frustum & valid_depth & (sdf >= -sdf_trunc)
    f = jnp.minimum(1.0, sdf / sdf_trunc)  # truncated signed distance in [-1, 1]
    stored = (f + 1.0) * 0.5

    new_weight = weight + observed.astype(jnp.float32)
    # running mean of stored values; untouched voxels keep their value
    upd = jnp.where(new_weight > 0, (tsdf * weight + stored) / jnp.maximum(new_weight, 1.0), tsdf)
    new_tsdf = jnp.where(observed, upd, tsdf)
    return new_tsdf, new_weight


@functools.partial(
    jax.jit, static_argnames=("resolution", "size", "sdf_trunc", "depth_trunc")
)
def fuse_views(
    depth_imgs: jax.Array,
    K: jax.Array,
    extrinsics: jax.Array,
    *,
    resolution: int | None = None,
    size: float,
    sdf_trunc: float,
    depth_trunc: float = 2.0,
    init: tuple[jax.Array, jax.Array] | None = None,
):
    """Fuse a stack of views in one compiled call via lax.scan.

    Args:
        depth_imgs: (V, H, W); extrinsics: (V, 4, 4); K: (3, 3).
        init: optional (tsdf, weight) to continue from; else zeros at ``resolution``.
    """
    if init is None:
        tsdf = jnp.zeros((resolution,) * 3, jnp.float32)
        weight = jnp.zeros((resolution,) * 3, jnp.float32)
    else:
        tsdf, weight = init

    def step(carry, view):
        t, w = carry
        d, E = view
        t, w = integrate_tsdf(t, w, d, K, E, size=size, sdf_trunc=sdf_trunc, depth_trunc=depth_trunc)
        return (t, w), None

    (tsdf, weight), _ = jax.lax.scan(step, (tsdf, weight), (depth_imgs, extrinsics))
    return tsdf, weight


def extract_surface_points(
    tsdf: np.ndarray, weight: np.ndarray, voxel_size: float, with_normals: bool = False
):
    """Host-side surface point extraction at the 0.5 iso-level.

    Finds zero-crossings of (tsdf - 0.5) between observed neighbor voxels
    along each axis and linearly interpolates the crossing point, yielding an
    (N, 3) metric point cloud (equivalent role to Open3D's
    ``extract_point_cloud`` used at perception.py:117-118). With
    ``with_normals``, also returns unit normals from the central-difference
    TSDF gradient (pointing from inside [low values] toward free space
    [high values], i.e. out of the surface).
    """
    tsdf = np.asarray(tsdf)
    weight = np.asarray(weight)
    f = tsdf - 0.5
    obs = weight > 0

    if with_normals:
        # gradient on a nearest-observed fill: unobserved voxels store 0
        # ("deeply inside"), so a raw gradient at observation boundaries
        # would point sideways into the unobserved region instead of out of
        # the surface (those normals orient grasp approach directions in
        # scripts/generate_data_parallel.py)
        filled = tsdf
        if not obs.all():
            from scipy import ndimage

            nearest = ndimage.distance_transform_edt(
                ~obs, return_distances=False, return_indices=True
            )
            filled = tsdf[tuple(nearest)]
        grad = np.stack(np.gradient(filled), axis=-1)

    pts, nrms = [], []
    for axis in range(3):
        a = [slice(None)] * 3
        b = [slice(None)] * 3
        a[axis] = slice(0, -1)
        b[axis] = slice(1, None)
        a, b = tuple(a), tuple(b)
        fa, fb = f[a], f[b]
        cross = (np.sign(fa) != np.sign(fb)) & obs[a] & obs[b] & (fa != fb)
        ii, jj, kk = np.nonzero(cross)
        if ii.size == 0:
            continue
        frac = fa[cross] / (fa[cross] - fb[cross])
        base = np.stack([ii, jj, kk], axis=1).astype(np.float64) + 0.5
        base[:, axis] += frac
        pts.append(base * voxel_size)
        if with_normals:
            g = grad[ii, jj, kk]
            n = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-12)
            nrms.append(n)
    if not pts:
        empty = np.zeros((0, 3))
        return (empty, empty.copy()) if with_normals else empty
    points = np.concatenate(pts, axis=0)
    if with_normals:
        return points, np.concatenate(nrms, axis=0)
    return points

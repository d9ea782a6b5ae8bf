"""Feature-plane sampling with exact torch ``grid_sample`` semantics.

The GIGA decoders sample each 2D feature plane at continuous query points with
``F.grid_sample(mode='bilinear', padding_mode='border', align_corners=True)``
(reference: ConvONets/conv_onet/models/decoder.py:117-130) after normalizing
coordinates to [0, 1] (ConvONets/common.py:238-261). That chain is
re-implemented here in two forms:

  * ``sample_plane``: gather-based bilinear sampling for arbitrary query sets.
  * ``interp_matrix_1d``: for tensor-product lattices of query points
    (the planner's dense 40^3 grid), bilinear sampling factorizes into two
    small dense matmuls per plane — an exact, MXU-friendly formulation with
    no gathers at all.

Coordinate conventions (match the reference exactly):
  * Points live in [-0.5, 0.5]^3.
  * ``normalize_coordinate``: u = p / (1 + padding + 1e-5) + 0.5, then
    values >= 1 are set to 1 - 1e-5 and values < 0 are set to 0.
  * align_corners=True: u in [0, 1] maps to pixel coordinate u * (R - 1).
  * border padding: pixel coordinates clamp to [0, R - 1].
  * Plane layout: planes[c, row, col] where ``col`` indexes the first plane
    axis (u[..., 0]) and ``row`` the second (u[..., 1]) — i.e. W-major like
    torch's grid_sample x/y convention.
"""

from __future__ import annotations

import jax.numpy as jnp

# first/second plane coordinate for each canonical plane, as indices into (x, y, z)
PLANE_AXES = {"xz": (0, 2), "xy": (0, 1), "yz": (1, 2)}


def normalize_coordinate(p2: jnp.ndarray, padding: float = 0.0) -> jnp.ndarray:
    """Map 2D plane coordinates from [-0.5, 0.5] to [0, 1).

    Exact replication of the reference's epsilon/clamp behavior
    (common.py:238-261): divide by (1 + padding + 1e-5), shift by 0.5, then
    set values >= 1 to 1 - 1e-5 and values < 0 to 0. Note this is NOT a
    clamp — values in (1 - 1e-5, 1) pass through unchanged.
    """
    u = p2 / (1.0 + padding + 1e-5) + 0.5
    u = jnp.where(u >= 1.0, 1.0 - 1e-5, u)
    u = jnp.where(u < 0.0, 0.0, u)
    return u


def normalize_3d_coordinate(p3: jnp.ndarray, padding: float = 0.0) -> jnp.ndarray:
    """3D variant; note the different epsilon (1e-3, common.py:263-279)."""
    u = p3 / (1.0 + padding + 1e-3) + 0.5
    u = jnp.where(u >= 1.0, 1.0 - 1e-3, u)
    u = jnp.where(u < 0.0, 0.0, u)
    return u


def sample_plane(plane: jnp.ndarray, p: jnp.ndarray, plane_type: str, padding: float = 0.0):
    """Bilinearly sample one feature plane at 3D query points.

    Args:
        plane: (H, W, C) feature plane (channels-last).
        p: (N, 3) query points in [-0.5, 0.5]^3.
        plane_type: 'xz' | 'xy' | 'yz'.
    Returns:
        (N, C) sampled features.
    """
    a0, a1 = PLANE_AXES[plane_type]
    u = normalize_coordinate(p[:, (a0, a1)], padding)
    H, W, _ = plane.shape
    # align_corners=True pixel coords; border padding = clamp
    fx = jnp.clip(u[:, 0] * (W - 1), 0.0, W - 1)  # col
    fy = jnp.clip(u[:, 1] * (H - 1), 0.0, H - 1)  # row
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(fx, jnp.int32)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(fy, jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = fx - x0
    wy = fy - y0

    f00 = plane[y0, x0]
    f01 = plane[y0, x1]
    f10 = plane[y1, x0]
    f11 = plane[y1, x1]
    top = f00 + (f01 - f00) * wx[:, None]
    bot = f10 + (f11 - f10) * wx[:, None]
    return top + (bot - top) * wy[:, None]


def sample_planes_concat(planes: dict, p: jnp.ndarray, padding: float = 0.0):
    """Sample all planes and concatenate features (concat_feat=True path).

    Concatenation order matches the reference decoder (decoder.py:136-147):
    xz, xy, yz.

    Args:
        planes: dict plane_type -> (H, W, C).
        p: (N, 3) points.
    Returns:
        (N, 3C) features.
    """
    feats = [sample_plane(planes[t], p, t, padding) for t in ("xz", "xy", "yz") if t in planes]
    return jnp.concatenate(feats, axis=-1)


def normalize_coord(p: jnp.ndarray, vol_range, plane_type: str = "xz"):
    """Normalize points to [0, 1] within an explicit volume range and project
    onto a plane ('grid' keeps 3D) — the sliding-window-crop variant
    (reference: common.py:281-301)."""
    lo = jnp.asarray(vol_range[0])
    hi = jnp.asarray(vol_range[1])
    u = (p - lo) / (hi - lo)
    if plane_type == "grid":
        return u
    a0, a1 = PLANE_AXES[plane_type]
    return u[..., (a0, a1)]


def positional_encoding_sincos(p: jnp.ndarray, num_freqs: int = 10):
    """NeRF-style sin/cos encoding (reference: common.py:422-444).

    p in [0, 1] -> mapped to [-1, 1] -> [sin(f pi p), cos(f pi p)] for
    f = 2^0..2^(L-1); output dim = 2 * L * D (=60 for D=3, L=10).
    """
    freqs = (2.0 ** jnp.arange(num_freqs)) * jnp.pi
    x = 2.0 * p - 1.0
    args = x[..., None, :] * freqs[:, None]  # (..., L, D)
    enc = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)  # (..., L, 2D)
    return enc.reshape(*p.shape[:-1], -1)


def map2local(p: jnp.ndarray, unit_size: float, pos_encoding: str = "linear"):
    """Map points to per-voxel local coordinates (reference: common.py:404-420)."""
    local = jnp.remainder(p, unit_size) / unit_size
    if pos_encoding == "sin_cos":
        return positional_encoding_sincos(local)
    return local


def sample_grid(grid: jnp.ndarray, p: jnp.ndarray, padding: float = 0.0):
    """Trilinearly sample a 3D feature grid at query points.

    Mirrors the reference's sample_grid_feature (decoder.py:124-130):
    normalize_3d_coordinate (1e-3 epsilon), then grid_sample(bilinear, border,
    align_corners=True) — which is trilinear for 5D inputs.

    Args:
        grid: (D, H, W, C) laid out [z, y, x, c] (the scatter_mean_grid
            layout, flat index x + R*(y + R*z)).
        p: (N, 3) points in [-0.5, 0.5]^3.
    Returns:
        (N, C).
    """
    u = normalize_3d_coordinate(p, padding)
    D, H, W, _ = grid.shape
    # torch grid_sample coords (x, y, z) index (W, H, D)
    fx = jnp.clip(u[:, 0] * (W - 1), 0.0, W - 1)
    fy = jnp.clip(u[:, 1] * (H - 1), 0.0, H - 1)
    fz = jnp.clip(u[:, 2] * (D - 1), 0.0, D - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, max(W - 2, 0))
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, max(H - 2, 0))
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, max(D - 2, 0))
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]
    wz = (fz - z0)[:, None]

    def at(dz, dy, dx):
        return grid[z0 + dz, y0 + dy, x0 + dx]

    c00 = at(0, 0, 0) * (1 - wx) + at(0, 0, 1) * wx
    c01 = at(0, 1, 0) * (1 - wx) + at(0, 1, 1) * wx
    c10 = at(1, 0, 0) * (1 - wx) + at(1, 0, 1) * wx
    c11 = at(1, 1, 0) * (1 - wx) + at(1, 1, 1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def interp_matrix_1d(coords: jnp.ndarray, reso: int, padding: float = 0.0) -> jnp.ndarray:
    """(N, reso) matrix M with M @ f == bilinear 1D interpolation of f at coords.

    ``coords`` are raw 1D point coordinates in [-0.5, 0.5]; normalization and
    border clamping match ``sample_plane`` exactly. For a tensor-product
    lattice of query points, sampling a (H, W, C) plane factorizes as
    ``einsum('qh,kw,hwc->qkc', M_row, M_col, plane)`` — two small matmuls that
    run on the MXU instead of 4 gathers per point.
    """
    u = normalize_coordinate(coords, padding)
    f = jnp.clip(u * (reso - 1), 0.0, reso - 1)
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, reso - 2)
    w = f - i0
    n = coords.shape[0]
    cols = jnp.arange(reso)[None, :]
    m0 = (cols == i0[:, None]) * (1.0 - w)[:, None]
    m1 = (cols == (i0 + 1)[:, None]) * w[:, None]
    return (m0 + m1).astype(jnp.float32)


def sample_plane_mm(plane: jnp.ndarray, p: jnp.ndarray, plane_type: str,
                    padding: float = 0.0, chunk: int = 8192, precision=None):
    """Gather-free bilinear plane sampling for ARBITRARY query sets.

    ``sample_plane`` issues 4 row-gathers per point; on TPU, gathers over a
    (H, W, C) plane run on the VPU at memory-system speed and dominate the
    large-N occupancy-query path (the reference's 100k-point eval_points
    chunking, ConvONets generation.py:326-358). Here each point's 4 bilinear
    weights become one row of a dense (N, H*W) matrix (outer product of the
    two 1D ``interp_matrix_1d`` rows — exact same clamping/epsilon semantics),
    and sampling is a single (chunk, H*W) @ (H*W, C) MXU matmul per chunk.
    ~2*H*W/4 more FLOPs than the gather form, all of them on the MXU.

    ``precision=None`` uses the backend default (bf16 passes on TPU);
    pass ``jax.lax.Precision.HIGHEST`` for results bit-comparable to
    ``sample_plane``'s fp32 arithmetic. Exact weights either way.
    """
    import jax

    a0, a1 = PLANE_AXES[plane_type]
    H, W, C = plane.shape
    mc = interp_matrix_1d(p[:, a0], W, padding)  # (N, W) col weights
    mr = interp_matrix_1d(p[:, a1], H, padding)  # (N, H) row weights
    flat = plane.reshape(H * W, C)
    n = p.shape[0]
    if n <= chunk:
        w2 = (mr[:, :, None] * mc[:, None, :]).reshape(n, H * W)
        return jnp.matmul(w2, flat, precision=precision)
    pad = (-n) % chunk
    mr_p = jnp.pad(mr, ((0, pad), (0, 0)))
    mc_p = jnp.pad(mc, ((0, pad), (0, 0)))

    def one(args):
        mr_c, mc_c = args
        w2 = (mr_c[:, :, None] * mc_c[:, None, :]).reshape(chunk, H * W)
        return jnp.matmul(w2, flat, precision=precision)

    out = jax.lax.map(one, (mr_p.reshape(-1, chunk, H),
                            mc_p.reshape(-1, chunk, W)))
    return out.reshape(-1, C)[:n]


def sample_planes_concat_mm(planes: dict, p: jnp.ndarray, padding: float = 0.0,
                            chunk: int = 8192, precision=None):
    """``sample_planes_concat`` via the gather-free MXU formulation."""
    feats = [sample_plane_mm(planes[t], p, t, padding, chunk, precision)
             for t in ("xz", "xy", "yz") if t in planes]
    return jnp.concatenate(feats, axis=-1)


def sample_plane_lattice(plane: jnp.ndarray, row_m: jnp.ndarray, col_m: jnp.ndarray):
    """Sample a (H, W, C) plane on the lattice defined by 1D interp matrices.

    Returns (Nrow, Ncol, C) = row_m @ plane @ col_m^T (per channel). Full
    precision: the interpolation weights are exact and the planes are the
    decoders' sole input, so bf16 matmul passes are not acceptable here.
    """
    import jax

    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("rh,hwc->rwc", row_m, plane, precision=hi)
    return jnp.einsum("qw,rwc->rqc", col_m, t, precision=hi)

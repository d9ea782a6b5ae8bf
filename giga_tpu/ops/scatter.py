"""Point->plane/grid pooling via segment reductions.

The TPU-native replacement for torch_scatter's scatter_mean/scatter_max
(reference: ConvONets/encoder/voxels.py:65, pointnet.py:5). Built on
jax.ops.segment_sum / segment_max with static segment counts so XLA compiles
them as on-device sorted-scatter updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from giga_tpu.ops.sampling import PLANE_AXES, normalize_coordinate, normalize_3d_coordinate


def plane_index(p: jnp.ndarray, plane_type: str, reso: int, padding: float = 0.0):
    """Flattened plane cell index per point (reference: common.py:303-318).

    index = col + reso * row with col = floor(u0 * reso), row = floor(u1 * reso).
    """
    a0, a1 = PLANE_AXES[plane_type]
    u = normalize_coordinate(p[..., (a0, a1)], padding)
    ij = (u * reso).astype(jnp.int32)
    return ij[..., 0] + reso * ij[..., 1]


def grid_index(p: jnp.ndarray, reso: int, padding: float = 0.0):
    """Flattened 3D grid index (common.py:315-316): x + reso*(y + reso*z)."""
    u = normalize_3d_coordinate(p, padding)
    ijk = (u * reso).astype(jnp.int32)
    return ijk[..., 0] + reso * (ijk[..., 1] + reso * ijk[..., 2])


def segment_mean(feat: jnp.ndarray, index: jnp.ndarray, num_segments: int):
    """(N, C) features + (N,) segment ids -> (num_segments, C) means (0 where empty)."""
    total = jax.ops.segment_sum(feat, index, num_segments=num_segments)
    count = jax.ops.segment_sum(jnp.ones((feat.shape[0], 1), feat.dtype), index, num_segments=num_segments)
    return total / jnp.maximum(count, 1.0)


def segment_max(feat: jnp.ndarray, index: jnp.ndarray, num_segments: int):
    """(N, C) -> (num_segments, C) maxima; empty segments are 0 (torch_scatter fills 0)."""
    out = jax.ops.segment_max(feat, index, num_segments=num_segments)
    return jnp.where(jnp.isneginf(out), 0.0, out)


@functools.partial(jax.jit, static_argnames=("plane_type", "reso", "padding"))
def scatter_mean_planes(points: jnp.ndarray, feat: jnp.ndarray, plane_type: str, reso: int, padding: float = 0.0):
    """Batched point->plane mean pooling.

    Args:
        points: (B, N, 3) in [-0.5, 0.5]^3.
        feat: (B, N, C).
    Returns:
        (B, reso, reso, C) plane, rows = second plane axis.
    """
    idx = plane_index(points, plane_type, reso, padding)

    def one(i, f):
        return segment_mean(f, i, reso * reso).reshape(reso, reso, -1)

    return jax.vmap(one)(idx, feat)


@functools.partial(jax.jit, static_argnames=("reso", "padding"))
def scatter_mean_grid(points: jnp.ndarray, feat: jnp.ndarray, reso: int, padding: float = 0.0):
    """Batched point->3D-grid mean pooling. Returns (B, reso, reso, reso, C).

    Grid layout follows the flattened index x + reso*(y + reso*z), i.e. the
    returned array is indexed [b, z, y, x, c].
    """
    idx = grid_index(points, reso, padding)

    def one(i, f):
        return segment_mean(f, i, reso**3).reshape(reso, reso, reso, -1)

    return jax.vmap(one)(idx, feat)

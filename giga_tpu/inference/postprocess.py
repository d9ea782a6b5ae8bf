"""On-device grasp post-processing: smooth -> mask -> bound -> select.

Jit-compatible, static-shape reimplementation of the reference host pipeline
(detection_implicit.py:87-185 / detection.py:83-183): Gaussian smoothing,
TSDF surface-band masking via masked dilation, width windowing, workspace
border zeroing, LOW_TH/threshold gating with the force-detection fallback,
4^3 max-filter NMS, and top-K selection (fixed K, -inf padded) instead of
np.argwhere's dynamic grasp list.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from giga_tpu.core.config import PlannerConfig
from giga_tpu.ops.filters import gaussian_blur_3d, masked_binary_dilation, max_filter_3d


class GraspCandidates(NamedTuple):
    """Top-K grasp candidates in normalized grid coordinates.

    scores: (K,) descending, -inf past ``count``.
    positions: (K, 3) query-lattice coords (same units the decoder saw).
    rotations: (K, 4) quaternions (xyzw).
    widths: (K,) predicted widths (normalized units for GIGA, voxels for VGN).
    count: () int32, number of valid candidates.
    """

    scores: jnp.ndarray
    positions: jnp.ndarray
    rotations: jnp.ndarray
    widths: jnp.ndarray
    count: jnp.ndarray


def mask_quality(qual, tsdf, width, cfg: PlannerConfig):
    """Smoothing + surface-band + width-window masking (reference process())."""
    qual = gaussian_blur_3d(qual, cfg.gaussian_sigma)
    outside = tsdf > cfg.out_th
    inside = (tsdf > 1e-3) & (tsdf < cfg.out_th)
    valid = masked_binary_dilation(outside, ~inside, iterations=2)
    qual = jnp.where(valid, qual, 0.0)
    qual = jnp.where((width < cfg.min_width) | (width > cfg.max_width), 0.0, qual)
    return qual


def bound_quality(qual, voxel_size: float, cfg: PlannerConfig):
    """Zero out workspace borders (reference bound()); last 3 axes spatial."""
    lx = int(cfg.bound_limits[0] / voxel_size)
    ly = int(cfg.bound_limits[1] / voxel_size)
    lz = int(cfg.bound_limits[2] / voxel_size)
    R = qual.shape[-1]
    ix = jnp.arange(R)
    mx = (ix >= lx) & (ix < R - lx)
    my = (ix >= ly) & (ix < R - ly)
    mz = ix >= lz
    return qual * (
        mx[:, None, None].astype(qual.dtype)
        * my[None, :, None].astype(qual.dtype)
        * mz[None, None, :].astype(qual.dtype)
    )


def _top_k_two_level(flat_scores, k: int):
    """Exact top-k over (B, N) via segment maxes, for N >> k.

    ``lax.top_k`` sorts all N entries (3.2 ms/batch at B=64, N=64000,
    k=128 — the single largest postprocess cost, round-3 micro-profile).
    NMS leaves only a handful of finite scores, so: partition N into
    segments of ``k``, rank segments by max, gather the top-k segments, and
    top-k over those k*k entries. Exact: at most k segments can contain
    top-k elements, and any segment containing one has max >= the k-th
    element, so it out-ranks every segment containing none. Ties at the
    k-th value may swap equal-valued candidates (same scores either way).

    Returns (top_scores (B, k), top_idx (B, k) flat indices into N).
    """
    B, N = flat_scores.shape
    # exactness requires picking k segments out of S >= k of them
    if N % k != 0 or N // k < k:
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
        return top_scores, top_idx
    S = N // k
    seg = flat_scores.reshape(B, S, k)
    _, seg_sel = jax.lax.top_k(seg.max(axis=-1), k)  # (B, k) segment ids
    cand = jnp.take_along_axis(seg, seg_sel[..., None], axis=1)  # (B, k, k)
    top_scores, local = jax.lax.top_k(cand.reshape(B, k * k), k)
    # flat index = segment_id * k + offset_within_segment
    seg_of = jnp.take_along_axis(seg_sel, local // k, axis=1)
    top_idx = seg_of * k + local % k
    return top_scores, top_idx


def select_grasps(qual, rot, width, positions, cfg: PlannerConfig) -> GraspCandidates:
    """Threshold + NMS + static top-K (reference select()).

    Args:
        qual: (R, R, R) masked/bounded quality.
        rot: (R, R, R, 4); width: (R, R, R); positions: (R, R, R, 3).
    """
    q = jnp.where(qual < cfg.low_th, 0.0, qual)
    any_above = jnp.any(q >= cfg.qual_th)
    best_only = jnp.logical_and(cfg.force_detection, ~any_above)
    q = jnp.where(best_only, q, jnp.where(q < cfg.qual_th, 0.0, q))

    max_vol = max_filter_3d(q, cfg.max_filter_size)
    peaks = (q == max_vol) & (q > 0.0)

    flat_scores = jnp.where(peaks, q, -jnp.inf).reshape(-1)
    k = min(cfg.max_grasps, flat_scores.shape[0])
    top_scores, top_idx = _top_k_two_level(flat_scores[None], k)
    top_scores, top_idx = top_scores[0], top_idx[0]
    count = jnp.sum(peaks).astype(jnp.int32)
    count = jnp.where(best_only, jnp.minimum(count, 1), count)
    count = jnp.minimum(count, k)
    # invalidate entries past count (handles best_only truncation)
    rank = jnp.arange(k)
    top_scores = jnp.where(rank < count, top_scores, -jnp.inf)

    top_pos = positions.reshape(-1, 3)[top_idx]
    top_rot = rot.reshape(-1, 4)[top_idx]
    top_width = width.reshape(-1)[top_idx]
    return GraspCandidates(top_scores, top_pos, top_rot, top_width, count)


def select_grasps_batched(qual, rot, width, positions, cfg: PlannerConfig) -> GraspCandidates:
    """Batched threshold + NMS + top-K: one program for (B, R, R, R) scenes.

    ``rot`` may arrive either as (B, R, R, R, 4) or TRANSPOSED as
    (B, 4, R^3) — the layout the Pallas fused decoder writes to avoid
    128-lane padding on the 4-wide quaternion axis; the top-k gather reads
    columns directly and only the tiny (B, k, 4) result is re-laid out.

    Returns GraspCandidates with a leading batch axis on every field.
    Semantics per scene match ``select_grasps``.
    """
    B = qual.shape[0]
    q = jnp.where(qual < cfg.low_th, 0.0, qual)
    any_above = jnp.any(q >= cfg.qual_th, axis=(1, 2, 3))  # (B,)
    best_only = jnp.logical_and(cfg.force_detection, ~any_above)
    q = jnp.where(
        best_only[:, None, None, None],
        q,
        jnp.where(q < cfg.qual_th, 0.0, q),
    )

    max_vol = max_filter_3d(q, cfg.max_filter_size)
    peaks = (q == max_vol) & (q > 0.0)

    flat_scores = jnp.where(peaks, q, -jnp.inf).reshape(B, -1)
    k = min(cfg.max_grasps, flat_scores.shape[1])
    top_scores, top_idx = _top_k_two_level(flat_scores, k)  # (B, k)
    count = jnp.sum(peaks, axis=(1, 2, 3)).astype(jnp.int32)
    count = jnp.where(best_only, jnp.minimum(count, 1), count)
    count = jnp.minimum(count, k)
    rank = jnp.arange(k)[None, :]
    top_scores = jnp.where(rank < count[:, None], top_scores, -jnp.inf)

    pos_flat = positions.reshape(-1, 3)  # shared lattice
    top_pos = pos_flat[top_idx]
    if rot.ndim == 3:  # transposed (B, 4, R^3) layout
        top_rot = jnp.take_along_axis(
            rot, top_idx[:, None, :], axis=2
        ).transpose(0, 2, 1)
    else:
        top_rot = jnp.take_along_axis(rot.reshape(B, -1, 4), top_idx[..., None], axis=1)
    top_width = jnp.take_along_axis(width.reshape(B, -1), top_idx, axis=1)
    # rot/width may arrive in the trunk dtype (bf16 serving keeps them
    # unwidened until after the gather — same values, 98 MB/batch less HBM
    # traffic); the candidate contract is fp32
    return GraspCandidates(top_scores, top_pos,
                           top_rot.astype(jnp.float32),
                           top_width.astype(jnp.float32), count)

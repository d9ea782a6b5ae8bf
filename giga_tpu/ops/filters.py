"""Small 3D stencil ops for the grasp planner, all jit-friendly.

Device-side replacements for the scipy.ndimage calls in the reference
post-processing (detection_implicit.py:126-158):

  * ``gaussian_blur_3d``     ~ ndimage.gaussian_filter(sigma, mode='nearest')
  * ``masked_binary_dilation`` ~ ndimage.binary_dilation(iterations, mask=...)
  * ``max_filter_3d``        ~ ndimage.maximum_filter(size=k)

All are separable / 6-neighborhood stencils expressed through pad +
reduce_window / conv so XLA maps them onto the VPU with static shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy-compatible 1D Gaussian kernel: radius = int(truncate*sigma + 0.5)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return (phi / phi.sum()).astype(np.float32)


import functools


@functools.lru_cache(maxsize=32)
def _blur_matrix_1d(n: int, sigma: float, truncate: float) -> np.ndarray:
    """(n, n) linear operator of a 1D Gaussian blur with edge-replicate
    boundaries: out[i] = sum_j T[i, j] v[j]. Clamped taps accumulate onto
    the border columns, so the matrix form is EXACTLY the correlate-with-
    edge-padding it replaces."""
    k = gaussian_kernel_1d(sigma, truncate)
    r = (len(k) - 1) // 2
    T = np.zeros((n, n), np.float32)
    rows = np.arange(n)
    for t, w in enumerate(k):
        np.add.at(T, (rows, np.clip(rows + t - r, 0, n - 1)), w)
    return T


def gaussian_blur_3d(vol: jnp.ndarray, sigma: float = 1.0, truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur with edge-replicate ('nearest') boundaries.

    Matches ndimage.gaussian_filter(vol, sigma, mode='nearest') to fp32
    accuracy over the LAST THREE axes; leading axes (batch) pass through.

    Each axis blur is a dense (n, n) matmul rather than a 2r+1-tap
    correlation: the taps-as-conv form costs ~27 VPU passes over the volume
    (1.5 ms of the B=64 batched postprocess, round-4 roofline) while the
    matmul form rides the MXU. Pinned HIGHEST so fp32 results stay within
    the scipy-parity tolerance regardless of ambient precision.
    """
    for axis in range(vol.ndim - 3, vol.ndim):
        T = jnp.asarray(_blur_matrix_1d(vol.shape[axis], float(sigma), float(truncate)))
        v = jnp.moveaxis(vol, axis, -1)
        out = jnp.tensordot(v, T, axes=[[-1], [1]],
                            precision=jax.lax.Precision.HIGHEST)
        vol = jnp.moveaxis(out, -1, axis)
    return vol


def _cross_dilate(b: jnp.ndarray) -> jnp.ndarray:
    """One binary dilation step with the 6-connected structure over the last
    three axes (leading axes are batch)."""
    out = b
    for axis in range(b.ndim - 3, b.ndim):
        fwd = jnp.pad(b, [(1, 0) if a == axis else (0, 0) for a in range(b.ndim)])
        fwd = jax.lax.slice_in_dim(fwd, 0, b.shape[axis], axis=axis)
        bwd = jnp.pad(b, [(0, 1) if a == axis else (0, 0) for a in range(b.ndim)])
        bwd = jax.lax.slice_in_dim(bwd, 1, b.shape[axis] + 1, axis=axis)
        out = out | fwd | bwd
    return out


def masked_binary_dilation(seed: jnp.ndarray, mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """ndimage.binary_dilation(seed, iterations=n, mask=mask) semantics.

    Positions where ``mask`` is False always keep their value from ``seed``;
    masked-in positions take the dilation result each iteration.
    """
    cur = seed
    for _ in range(iterations):
        cur = jnp.where(mask, _cross_dilate(cur), seed)
    return cur


def max_filter_3d(vol: jnp.ndarray, size: int) -> jnp.ndarray:
    """ndimage.maximum_filter(vol, size=size) over the last three axes
    (leading axes are batch).

    scipy's window for even ``size`` spans offsets [-size//2, size - size//2 - 1]
    around each output voxel; -inf padding is equivalent to scipy's 'reflect'
    here because the reflected values are always drawn from inside the window.
    """
    lo = size // 2
    hi = size - lo - 1
    lead = vol.ndim - 3
    # max over a box is separable: three 1D window maxes (3*size compares
    # per voxel) instead of one dense size^3 window (size^3 compares) —
    # the NMS max-filter is part of the VPU-bound postprocess stage
    for axis in range(lead, vol.ndim):
        window = [1] * vol.ndim
        window[axis] = size
        padding = [(0, 0)] * vol.ndim
        padding[axis] = (lo, hi)
        vol = jax.lax.reduce_window(
            vol, -jnp.inf, jax.lax.max,
            window_dimensions=tuple(window),
            window_strides=(1,) * vol.ndim,
            padding=padding,
        )
    return vol

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


def gaussian_blur_3d(vol: jnp.ndarray, sigma: float = 1.0, truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur with edge-replicate ('nearest') boundaries.

    Matches ndimage.gaussian_filter(vol, sigma, mode='nearest') to fp32
    accuracy over the LAST THREE axes; leading axes (batch) pass through.
    """
    k = jnp.asarray(gaussian_kernel_1d(sigma, truncate))
    r = (k.shape[0] - 1) // 2

    def blur_axis(v, axis):
        v = jnp.moveaxis(v, axis, -1)
        shape = v.shape
        padded = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(r, r)], mode="edge")
        flat = padded.reshape(-1, padded.shape[-1])
        # correlate each row with the kernel: output length == original
        out = jax.vmap(lambda row: jnp.correlate(row, k, mode="valid"))(flat)
        return jnp.moveaxis(out.reshape(shape), -1, axis)

    for axis in range(vol.ndim - 3, vol.ndim):
        vol = blur_axis(vol, axis)
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
    return jax.lax.reduce_window(
        vol,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * lead + (size,) * 3,
        window_strides=(1,) * vol.ndim,
        padding=[(0, 0)] * lead + [(lo, hi)] * 3,
    )

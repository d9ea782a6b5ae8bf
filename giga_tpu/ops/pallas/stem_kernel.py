"""Pallas TPU kernel: fused conv stem + triplane axis-mean pooling.

The batched encoder's conv stem materializes (B, R, R, R, C) voxel features
in HBM (~0.5 GB at B=64 bf16) only for the pooling reduction to read them
straight back — stem+pool measured 3.3 ms of the 4.2 ms batched encode
(round-3 roofline), with the three 40^2 plane outputs totalling just 12 MB.

This kernel runs both stages per scene in VMEM: the z-banded 2D image form
(giga_tpu/models/layers.py::zbanded_kernel — z folded into channels) as a
sum of k x-shifted (X*Y, k*Z) @ (k*Z, Z*C) MXU matmuls (y-shifts
pre-concatenated by XLA outside the kernel), bias + ReLU, then the three
axis means — the z-mean as a pooling matmul, the x/y means as major-axis
reductions — emitted flat and unflattened outside (reference plane layout:
row = second axis, col = first; encoder.py::axis_mean_planes). The voxel
volume never touches HBM.

Numerics match the XLA path to reassociation rounding (the conv lowering
reduces in a different order); with ``compute_dtype=bf16`` the matmul runs
on bf16 inputs with fp32 accumulation like the decoder kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from giga_tpu.models.layers import zbanded_kernel
from giga_tpu.ops.pallas.decoder_kernel import _mm

HI = jax.lax.Precision.HIGHEST


def _stem_pool_kernel(img_ref, w_ref, b_ref, p_ref, xz_ref, xy_ref, yz_ref,
                      *, k: int, X: int, Y: int, Z: int, C: int,
                      compute_dtype):
    # Mosaic cannot split the minor (lane) dim in reshapes, so the (Z*C)
    # axis stays flat throughout: the z-mean is a pooling MATMUL, the x/y
    # means are major-axis reductions, and the final (Z, C) unflatten +
    # plane transposes happen outside the kernel on the tiny outputs.
    img = img_ref[0]  # (X+2h, Y, k*Z) fp32: y-shifts pre-concatenated by XLA
    # conv as a sum of k x-shifted matmuls with contraction k*Z (=120): the
    # k^2 single-shift form (K=40) was MXU-pass-bound at 3x the passes, and
    # Mosaic cannot concatenate shifted slices along lanes in-kernel, so the
    # y-shift concat happens outside (a cheap (B, X+2h, Y, k*Z) tensor)
    out = None
    for dx in range(k):
        sl = img[dx : dx + X].reshape(X * Y, k * Z)
        term = _mm(sl, w_ref[dx], compute_dtype)
        out = term if out is None else out + term
    out = jax.nn.relu(out + b_ref[0][None, :])  # (X*Y, Z*C)
    # mean over z: (Z*C, C) pooling matrix, fp32 for exact averaging
    xy_ref[0] = jnp.dot(out, p_ref[...],
                        preferred_element_type=jnp.float32, precision=HI)
    o3 = out.reshape(X, Y, Z * C)  # major-dim split only
    xz_ref[0] = o3.mean(1)  # mean over y -> (X, Z*C)
    yz_ref[0] = o3.mean(0)  # mean over x -> (Y, Z*C)


@functools.partial(jax.jit, static_argnames=("kernel_size", "c_dim",
                                             "compute_dtype", "interpret"))
def fused_stem_pool_batched(kernel, bias, tsdfs, *, kernel_size: int = 3,
                            c_dim: int = 32, compute_dtype=jnp.float32,
                            interpret: bool = False):
    """(B, X, Y, Z) TSDF -> {'xz','xy','yz': (B, H, W, C)} pooled planes.

    kernel: (k, k, k, 1, C) conv3d weights; bias: (C,).
    Output = axis_mean_planes(relu(conv3d(tsdf) + bias)) in one kernel.
    """
    k, C = kernel_size, c_dim
    half = k // 2
    B, X, Y, Z = tsdfs.shape
    # weights regrouped per x-shift: w2[dx, dy*Z + zin, zout*C + c]
    w2 = zbanded_kernel(kernel, Z).reshape(k, k * Z, Z * C)
    if compute_dtype == jnp.bfloat16:
        w2 = w2.astype(jnp.bfloat16)
    else:
        w2 = w2.astype(jnp.float32)
    # out channel index = z*C + c -> bias repeats per z slice
    b2 = jnp.tile(bias.astype(jnp.float32), Z)[None, :]
    # z-mean pooling matrix: row z*C+c -> col c, weight 1/Z
    pool = jnp.tile(jnp.eye(C, dtype=jnp.float32), (Z, 1)) / Z
    padded = jnp.pad(tsdfs.astype(jnp.float32),
                     ((0, 0), (half, half), (half, half), (0, 0)))
    # pre-concatenate the y-shifts along z: img[b, x, y, dy*Z + z]
    img = jnp.concatenate(
        [padded[:, :, dy : dy + Y, :] for dy in range(k)], axis=-1
    )

    kern = functools.partial(
        _stem_pool_kernel, k=k, X=X, Y=Y, Z=Z, C=C,
        compute_dtype=compute_dtype,
    )

    def const(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, X + 2 * half, Y, k * Z),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            const((k, k * Z, Z * C)),
            const((1, Z * C)),
            const((Z * C, C)),
        ],
        out_specs=[
            pl.BlockSpec((1, X, Z * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X * Y, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, Z * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    xz_f, xy_f, yz_f = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((B, X, Z * C), jnp.float32),
            jax.ShapeDtypeStruct((B, X * Y, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Y, Z * C), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(img, w2, b2, pool)
    # unflatten + reference plane layout (row = second axis, col = first);
    # these are XLA ops on the small plane tensors
    return {
        "xz": xz_f.reshape(B, X, Z, C).transpose(0, 2, 1, 3),
        "xy": xy_f.reshape(B, X, Y, C).transpose(0, 2, 1, 3),
        "yz": yz_f.reshape(B, Y, Z, C).transpose(0, 2, 1, 3),
    }


def encode_planes_fused(enc_params: dict, tsdfs, enc_cfg, compute_dtype=jnp.float32,
                        interpret: bool = False):
    """Batched triplane encode with the fused stem+pool kernel + the
    module's own 2D U-Net (models/encoder.py::TriplaneVoxelEncoder.__call__
    lattice_exact path, which requires padding == 0 and input resolution ==
    plane resolution — callers must check ``can_encode_fused``)."""
    from giga_tpu.models.unet2d import UNet2D

    conv = enc_params["conv_in"]["conv"]
    pooled = fused_stem_pool_batched(
        conv["kernel"], conv["bias"], tsdfs,
        kernel_size=enc_cfg.kernel_size, c_dim=enc_cfg.c_dim,
        compute_dtype=compute_dtype, interpret=interpret,
    )
    dtype = jax.tree.leaves(enc_params)[0].dtype
    order = [t for t in ("xz", "xy", "yz") if t in enc_cfg.plane_types]
    stacked = jnp.concatenate([pooled[t].astype(dtype) for t in order], axis=0)
    refined = UNet2D(enc_cfg.c_dim, enc_cfg.unet).apply(
        {"params": enc_params["unet"]}, stacked
    )
    chunks = jnp.split(refined, len(order), axis=0)
    return {t: c for t, c in zip(order, chunks)}


def can_encode_fused(enc_cfg, tsdf_shape) -> bool:
    """The fused path reproduces the encoder's lattice_exact branch only."""
    return (
        "grid" not in enc_cfg.plane_types
        and enc_cfg.padding == 0.0
        and tuple(tsdf_shape[-3:]) == (enc_cfg.plane_resolution,) * 3
    )

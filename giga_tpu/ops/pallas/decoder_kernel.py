"""Pallas TPU kernel: fully-fused dense affordance decode.

The planner's hot loop is the stacked 3-head implicit decoder evaluated on
the full R^3 query lattice. The XLA path (inference/dense_decode.py) already
factorizes the plane sampling and fc_c projections onto R^2 lattices, but the
ResNet trunk still materializes (heads, R, R, R, hidden) activations in HBM
between blocks — at R=40, hidden=32, that is ~25 MB per intermediate and the
op becomes HBM-bound.

This kernel runs the whole trunk in VMEM. Grid = R programs (one x-slab
each). Per program it:
  1. assembles the block-0 input from broadcast pieces: the separable fc_p
     terms (px/py/pz) plus, per block, the three per-plane fc_c projections
     (xz/xy rows for this slab, the full yz projection kept VMEM-resident via
     a constant index_map);
  2. executes all n_blocks ResnetBlockFC stages and fc_out as (R^2, hidden)
     MXU matmuls per head, never leaving VMEM;
  3. writes only the final (heads, R, R, out) slab.

Compute dtype is configurable: fp32 for bit-parity with the XLA path, bf16
(fp32 accumulation) for ~3x MXU throughput in fast mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _trunk_kernel(px_ref, py_ref, pz_ref, pxz_ref, pxy_ref, pyz_ref,
                  w0_ref, b0_ref, w1_ref, b1_ref, wout_ref, bout_ref,
                  out_ref, *, n_blocks: int, compute_dtype):
    H, R, hid = py_ref.shape
    out_dim = out_ref.shape[-1]

    def mm(a, w):
        if compute_dtype == jnp.bfloat16:
            a = a.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
            return jnp.dot(a, w, preferred_element_type=jnp.float32)
        return jnp.dot(
            a, w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    for h in range(H):
        # block-0 input: separable fc_p + per-block plane projections
        net = (
            px_ref[0, h][None, None, :]
            + py_ref[h][:, None, :]
            + pz_ref[h][None, :, :]
        )  # (Ry, Rz, hid)
        for b in range(n_blocks):
            net = (
                net
                + pxz_ref[0, b, h][None, :, :]   # z-dependent row (this x)
                + pxy_ref[0, b, h][:, None, :]   # y-dependent row (this x)
                + pyz_ref[b, h]                  # (Ry, Rz, hid), resident
            )
            flat = net.reshape(R * R, hid)
            hidden = mm(jax.nn.relu(flat), w0_ref[b, h]) + b0_ref[b, h][None, :]
            dx = mm(jax.nn.relu(hidden), w1_ref[b, h]) + b1_ref[b, h][None, :]
            net = (flat + dx).reshape(R, R, hid)
        flat = net.reshape(R * R, hid)
        out = mm(jax.nn.relu(flat), wout_ref[h]) + bout_ref[h][None, :]
        out_ref[0, h] = out.reshape(R, R, out_dim)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "interpret")
)
def fused_dense_decode(px, py, pz, pxz, pxy, pyz, w0, b0, w1, b1, wout, bout,
                       *, n_blocks: int = 5, compute_dtype=jnp.float32,
                       interpret: bool = False):
    """Run the fused trunk. Shapes (H=heads, R=lattice, C=hidden, O=out):

        px/py/pz: (H, R, C)  separable fc_p terms (+bias folded into px)
        pxz/pxy/pyz: (n_blocks, H, R, R, C) per-block plane projections,
            indexed [b, h, first_axis, second_axis] (+fc_c bias in pxz)
        w0/b0/w1/b1: (n_blocks, H, C, C) / (n_blocks, H, C)
        wout/bout: (H, C, O) / (H, O)
    Returns (H, R, R, R, O) raw head outputs, indexed [h, x, y, z, o].
    """
    H, R, C = px.shape
    O = wout.shape[-1]
    kernel = functools.partial(
        _trunk_kernel, n_blocks=n_blocks, compute_dtype=compute_dtype
    )

    # Pallas TPU requires the last two block dims to equal the array dims (or
    # hardware tiles), so the grid-sliced x axis leads each sliced operand.
    px_t = px.transpose(1, 0, 2)              # (R, H, C)
    pxz_t = pxz.transpose(2, 0, 1, 3, 4)      # (Rx, nb, H, Rz, C)
    pxy_t = pxy.transpose(2, 0, 1, 3, 4)      # (Rx, nb, H, Ry, C)

    def const(shape):
        # constant index_map -> Mosaic keeps the block VMEM-resident across
        # grid steps instead of re-fetching it
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, H, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((H, R, C)),
            const((H, R, C)),
            pl.BlockSpec((1, n_blocks, H, R, C), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks, H, R, C), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            const((n_blocks, H, R, R, C)),
            const((n_blocks, H, C, C)),
            const((n_blocks, H, C)),
            const((n_blocks, H, C, C)),
            const((n_blocks, H, C)),
            const((H, C, O)),
            const((H, O)),
        ],
        out_specs=pl.BlockSpec((1, H, R, R, O), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, H, R, R, O), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(px_t, py, pz, pxz_t, pxy_t, pyz, w0, b0, w1, b1, wout, bout)
    return out.transpose(1, 0, 2, 3, 4)  # (H, Rx, Ry, Rz, O)


def _trunk_kernel_batched(px_ref, py_ref, pz_ref, pxz_ref, pxy_ref, pyz_ref,
                          w0_ref, b0_ref, w1_ref, b1_ref, wout_ref, bout_ref,
                          out_ref, *, n_blocks: int, compute_dtype):
    """Per-(scene, x-slab) program; same math as _trunk_kernel with a scene
    axis on the projection refs."""
    H, R, hid = py_ref.shape
    out_dim = out_ref.shape[-1]

    def mm(a, w):
        if compute_dtype == jnp.bfloat16:
            a = a.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
            return jnp.dot(a, w, preferred_element_type=jnp.float32)
        return jnp.dot(
            a, w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    for h in range(H):
        net = (
            px_ref[0, h][None, None, :]
            + py_ref[h][:, None, :]
            + pz_ref[h][None, :, :]
        )  # (Ry, Rz, hid)
        for b in range(n_blocks):
            net = (
                net
                + pxz_ref[0, 0, b, h][None, :, :]
                + pxy_ref[0, 0, b, h][:, None, :]
                + pyz_ref[0, b, h]
            )
            flat = net.reshape(R * R, hid)
            hidden = mm(jax.nn.relu(flat), w0_ref[b, h]) + b0_ref[b, h][None, :]
            dx = mm(jax.nn.relu(hidden), w1_ref[b, h]) + b1_ref[b, h][None, :]
            net = (flat + dx).reshape(R, R, hid)
        flat = net.reshape(R * R, hid)
        out = mm(jax.nn.relu(flat), wout_ref[h]) + bout_ref[h][None, :]
        out_ref[0, 0, h] = out.reshape(R, R, out_dim)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "interpret")
)
def fused_dense_decode_batched(px, py, pz, pxz, pxy, pyz, w0, b0, w1, b1,
                               wout, bout, *, n_blocks: int = 5,
                               compute_dtype=jnp.float32, interpret: bool = False):
    """Batched fused trunk: grid (B, Rx); the per-scene yz projection stays
    VMEM-resident across the inner x sweep (index_map depends only on b).

    Shapes: px/py/pz (H, R, C) shared across scenes;
    pxz/pxy/pyz (B, n_blocks, H, R, R, C); weights as in fused_dense_decode.
    Returns (H, B, R, R, R, O).
    """
    H, R, C = px.shape
    B = pxz.shape[0]
    O = wout.shape[-1]
    kernel = functools.partial(
        _trunk_kernel_batched, n_blocks=n_blocks, compute_dtype=compute_dtype
    )

    px_t = px.transpose(1, 0, 2)                 # (R, H, C)
    pxz_t = pxz.transpose(0, 3, 1, 2, 4, 5)      # (B, Rx, nb, H, Rz, C)
    pxy_t = pxy.transpose(0, 3, 1, 2, 4, 5)      # (B, Rx, nb, H, Ry, C)

    def const(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B, R),
        in_specs=[
            pl.BlockSpec((1, H, C), lambda b, i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((H, R, C)),
            const((H, R, C)),
            pl.BlockSpec((1, 1, n_blocks, H, R, C), lambda b, i: (b, i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_blocks, H, R, C), lambda b, i: (b, i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks, H, R, R, C), lambda b, i: (b, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            const((n_blocks, H, C, C)),
            const((n_blocks, H, C)),
            const((n_blocks, H, C, C)),
            const((n_blocks, H, C)),
            const((H, C, O)),
            const((H, O)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, R, R, O), lambda b, i: (b, i, 0, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, H, R, R, O), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # the unrolled heads x blocks body needs more scoped stack than the
        # 16 MB default (v5e has 128 MB of VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(px_t, py, pz, pxz_t, pxy_t, pyz, w0, b0, w1, b1, wout, bout)
    return out.transpose(2, 0, 1, 3, 4, 5)  # (H, B, Rx, Ry, Rz, O)


def prepare_projections_batched(dec_params: dict, feats: dict, coords, n_blocks: int = 5):
    """Batched projection precompute: feats {t: (B, R, R, C)} ->
    px/py/pz (H, R, C) + pxz/pxy/pyz (B, n_blocks, H, R, R, C) + weights."""
    hi = jax.lax.Precision.HIGHEST
    w_p = dec_params["fc_p_kernel"]
    b_p = dec_params["fc_p_bias"]
    coords = coords.astype(jnp.float32)
    px = jnp.einsum("r,ek->erk", coords, w_p[:, 0], precision=hi) + b_p[:, None, :]
    py = jnp.einsum("r,ek->erk", coords, w_p[:, 1], precision=hi)
    pz = jnp.einsum("r,ek->erk", coords, w_p[:, 2], precision=hi)

    c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
    pxz, pxy, pyz = [], [], []
    for i in range(n_blocks):
        w_c = dec_params[f"fc_c{i}_kernel"]
        b_c = dec_params[f"fc_c{i}_bias"]
        pxz.append(
            jnp.einsum("qabc,ech->qeabh", feats["xz"], w_c[:, :c_dim], precision=hi)
            + b_c[None, :, None, None, :]
        )
        pxy.append(
            jnp.einsum("qabc,ech->qeabh", feats["xy"], w_c[:, c_dim : 2 * c_dim], precision=hi)
        )
        pyz.append(
            jnp.einsum("qabc,ech->qeabh", feats["yz"], w_c[:, 2 * c_dim :], precision=hi)
        )
    pxz = jnp.stack(pxz, axis=1)  # (B, nb, H, R, R, C)
    pxy = jnp.stack(pxy, axis=1)
    pyz = jnp.stack(pyz, axis=1)

    w0 = jnp.stack([dec_params[f"block{i}_fc0_kernel"] for i in range(n_blocks)])
    b0 = jnp.stack([dec_params[f"block{i}_fc0_bias"] for i in range(n_blocks)])
    w1 = jnp.stack([dec_params[f"block{i}_fc1_kernel"] for i in range(n_blocks)])
    b1 = jnp.stack([dec_params[f"block{i}_fc1_bias"] for i in range(n_blocks)])
    wout = dec_params["fc_out_kernel"]
    bout = dec_params["fc_out_bias"]
    return px, py, pz, pxz, pxy, pyz, w0, b0, w1, b1, wout, bout


def decode_affordance_dense_pallas_batched(dec_params: dict, feats: dict, coords,
                                           n_blocks: int = 5,
                                           compute_dtype=jnp.float32,
                                           interpret: bool = False):
    """Batched drop-in for decode_affordance_dense_batched via the fused kernel.

    Returns qual (B,R,R,R), rot (B,R,R,R,4), width (B,R,R,R)."""
    inputs = prepare_projections_batched(dec_params, feats, coords, n_blocks)
    out = fused_dense_decode_batched(
        *inputs, n_blocks=n_blocks, compute_dtype=compute_dtype, interpret=interpret
    )
    qual = jax.nn.sigmoid(out[0, ..., 0])
    rot = out[1]
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
    width = out[2, ..., 0]
    return qual, rot, width


def prepare_projections(dec_params: dict, feats: dict, coords, n_blocks: int = 5):
    """Precompute the broadcast pieces the kernel consumes (tiny einsums).

    feats: {t: (R, R, C)} per-plane lattice features, [first_axis, second_axis].
    Returns the 12-tuple of kernel inputs.
    """
    hi = jax.lax.Precision.HIGHEST
    w_p = dec_params["fc_p_kernel"]  # (H, 3, C)
    b_p = dec_params["fc_p_bias"]  # (H, C)
    px = jnp.einsum("r,ek->erk", coords, w_p[:, 0], precision=hi) + b_p[:, None, :]
    py = jnp.einsum("r,ek->erk", coords, w_p[:, 1], precision=hi)
    pz = jnp.einsum("r,ek->erk", coords, w_p[:, 2], precision=hi)

    c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
    pxz, pxy, pyz = [], [], []
    for i in range(n_blocks):
        w_c = dec_params[f"fc_c{i}_kernel"]  # (H, 3c, C)
        b_c = dec_params[f"fc_c{i}_bias"]
        pxz.append(
            jnp.einsum("abc,ech->eabh", feats["xz"], w_c[:, :c_dim], precision=hi)
            + b_c[:, None, None, :]
        )
        pxy.append(
            jnp.einsum("abc,ech->eabh", feats["xy"], w_c[:, c_dim : 2 * c_dim], precision=hi)
        )
        pyz.append(
            jnp.einsum("abc,ech->eabh", feats["yz"], w_c[:, 2 * c_dim :], precision=hi)
        )
    pxz = jnp.stack(pxz)
    pxy = jnp.stack(pxy)
    pyz = jnp.stack(pyz)

    w0 = jnp.stack([dec_params[f"block{i}_fc0_kernel"] for i in range(n_blocks)])
    b0 = jnp.stack([dec_params[f"block{i}_fc0_bias"] for i in range(n_blocks)])
    w1 = jnp.stack([dec_params[f"block{i}_fc1_kernel"] for i in range(n_blocks)])
    b1 = jnp.stack([dec_params[f"block{i}_fc1_bias"] for i in range(n_blocks)])
    wout = dec_params["fc_out_kernel"]
    bout = dec_params["fc_out_bias"]
    return px, py, pz, pxz, pxy, pyz, w0, b0, w1, b1, wout, bout


def decode_affordance_dense_pallas(dec_params: dict, feats: dict, coords,
                                   n_blocks: int = 5, compute_dtype=jnp.float32,
                                   interpret: bool = False):
    """Drop-in replacement for decode_affordance_dense using the fused kernel."""
    inputs = prepare_projections(dec_params, feats, coords, n_blocks)
    out = fused_dense_decode(
        *inputs, n_blocks=n_blocks, compute_dtype=compute_dtype, interpret=interpret
    )
    qual = jax.nn.sigmoid(out[0, ..., 0])
    rot = out[1]
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
    width = out[2, ..., 0]
    return qual, rot, width

"""Pallas TPU kernel: fully-fused dense affordance decode.

The planner's hot loop is the stacked 3-head implicit decoder evaluated on
the full R^3 query lattice. The XLA path (inference/dense_decode.py) already
factorizes the plane sampling and fc_c projections onto R^2 lattices and
fuses the heads into one block-diagonal (F=heads*hidden) trunk, but it still
materializes (R, R, R, F) activations in HBM between ResNet blocks — at
R=40, F=96, that is ~25 MB per intermediate per scene and the batched path
becomes HBM-bound.

This kernel runs the whole trunk in VMEM, in the same fused-head space as
the XLA path (giga_tpu/inference/dense_decode.py::_fused_head_weights):
grid = R programs (one x-slab each). Per program it

  1. assembles the block-0 input from broadcast pieces: the separable fc_p
     terms (px/py/pz) plus, per block, the three per-plane fc_c projections
     (the xz/xy rows for this slab; the full yz projection kept VMEM-resident
     via a constant index_map);
  2. executes all n_blocks ResnetBlockFC stages and fc_out as (R^2, F) MXU
     matmuls, never leaving VMEM;
  3. writes only the final (R, R, heads*out) slab.

All refs stay fp32 (Mosaic's vector layouts for broadcasts are fp32-clean);
``compute_dtype=bf16`` casts to bf16 only at the MXU dots, with fp32
accumulation — ~3x MXU throughput in fast mode, while the elementwise
assembly stays exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from giga_tpu.inference.dense_decode import _fused_head_weights

HI = jax.lax.Precision.HIGHEST


def _mm(a, w, compute_dtype):
    if compute_dtype == jnp.bfloat16:
        return jnp.dot(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(a, w, preferred_element_type=jnp.float32, precision=HI)


def _prepare_axis_terms(pk, coords):
    """Separable fc_p terms px/py/pz (R, F), fc_p bias folded into px —
    shared by every prepare_* variant."""
    coords = coords.astype(pk["fc_p_kernel"].dtype)
    w_p = pk["fc_p_kernel"]  # (3, F)
    px = jnp.einsum("r,k->rk", coords, w_p[0], precision=HI) + pk["fc_p_bias"]
    py = jnp.einsum("r,k->rk", coords, w_p[1], precision=HI)
    pz = jnp.einsum("r,k->rk", coords, w_p[2], precision=HI)
    return px, py, pz


def _trunk_weight_stack(pk, n_blocks: int):
    """(w0, b0, w1, b1, wout, bout) stacks of the fused trunk weights —
    shared tail of every prepare_* variant's kernel-input tuple."""
    return (
        jnp.stack([pk[f"block{i}_fc0_kernel"] for i in range(n_blocks)]),
        jnp.stack([pk[f"block{i}_fc0_bias"] for i in range(n_blocks)]),
        jnp.stack([pk[f"block{i}_fc1_kernel"] for i in range(n_blocks)]),
        jnp.stack([pk[f"block{i}_fc1_bias"] for i in range(n_blocks)]),
        pk["fc_out_kernel"], pk["fc_out_bias"][None, :],
    )


def _trunk_kernel(px_ref, py_ref, pz_ref, pxz_ref, pxy_ref, pyz_ref,
                  w0_ref, b0_ref, w1_ref, b1_ref, wout_ref, bout_ref,
                  out_ref, *, n_blocks: int, compute_dtype):
    R, F = py_ref.shape
    out_dim = out_ref.shape[-1]

    # block-0 input: separable fc_p terms (fc_p bias folded into px)
    net = (
        px_ref[0, 0][None, None, :]
        + py_ref[...][:, None, :]
        + pz_ref[...][None, :, :]
    )  # (Ry, Rz, F)
    for b in range(n_blocks):
        net = (
            net
            + pxz_ref[0, b][None, :, :]  # z-dependent row for this x slab
            + pxy_ref[0, b][:, None, :]  # y-dependent row for this x slab
            + pyz_ref[b]                 # (Ry, Rz, F), VMEM-resident
        )
        flat = net.reshape(R * R, F)
        hidden = _mm(jax.nn.relu(flat), w0_ref[b], compute_dtype) + b0_ref[b][None, :]
        dx = _mm(jax.nn.relu(hidden), w1_ref[b], compute_dtype) + b1_ref[b][None, :]
        net = (flat + dx).reshape(R, R, F)
    flat = net.reshape(R * R, F)
    out = _mm(jax.nn.relu(flat), wout_ref[...], compute_dtype) + bout_ref[0][None, :]
    out_ref[0] = out.reshape(R, R, out_dim)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "interpret")
)
def fused_dense_decode(px, py, pz, pxz, pxy, pyz, w0, b0, w1, b1, wout, bout,
                       *, n_blocks: int = 5, compute_dtype=jnp.float32,
                       interpret: bool = False):
    """Run the fused trunk. Shapes (R = lattice, F = heads*hidden, O = heads*out):

        px/py/pz: (R, F) separable fc_p terms (fc_p bias folded into px)
        pxz/pxy/pyz: (n_blocks, R, R, F) per-block plane projections,
            indexed [b, first_axis, second_axis] (fc_c bias folded into pxz)
        w0/b0/w1/b1: (n_blocks, F, F) / (n_blocks, F) block-diagonal trunk
        wout/bout: (F, O) / (1, O)
    Returns (R, R, R, O) raw outputs, indexed [x, y, z, o].
    """
    R, F = px.shape
    O = wout.shape[-1]
    kernel = functools.partial(
        _trunk_kernel, n_blocks=n_blocks, compute_dtype=compute_dtype
    )

    # grid-sliced operands lead with the x axis; px gets a unit middle
    # axis so the sliced dim stays out of the (8, 128)-tiled trailing dims
    px3 = px[:, None, :]               # (Rx, 1, F)
    pxz_t = pxz.transpose(1, 0, 2, 3)  # (Rx, nb, Rz, F)
    pxy_t = pxy.transpose(1, 0, 2, 3)  # (Rx, nb, Ry, F)

    def const(shape):
        # constant index_map -> Mosaic keeps the block VMEM-resident across
        # grid steps instead of re-fetching it
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((R, F)),
            const((R, F)),
            pl.BlockSpec((1, n_blocks, R, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks, R, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            const((n_blocks, R, R, F)),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            const((F, O)),
            const((1, O)),
        ],
        out_specs=pl.BlockSpec((1, R, R, O), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, R, R, O), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(px3, py, pz, pxz_t, pxy_t, pyz, w0, b0, w1, b1, wout, bout)


def _trunk_kernel_batched(px_ref, py_ref, pz_ref, pxz_ref, pxy_ref, pyz_ref,
                          w0_ref, b0_ref, w1_ref, b1_ref, wout_ref, bout_ref,
                          out_ref, *, n_blocks: int, compute_dtype,
                          resident_bf16: bool = False,
                          fold_b1: bool = False, hidden_bf16: bool = False,
                          transposed: bool = False):
    """Per-(scene, x-slab-group) program; same math as _trunk_kernel with a
    scene axis on the projection refs. Each program handles SX consecutive
    x slabs — fewer grid steps and 4x-larger matmul M amortize the per-step
    overheads (measured ~8% at SX=4 vs SX=1).

    ``resident_bf16`` keeps the residual stream itself in bf16 between ops
    (round-4 experiment): differencing the measured fp32 vs bf16 decode
    isolates ~8 ms of VPU broadcast/assembly vs ~4.6 ms of MXU time per
    B=64 batch, and bf16 elementwise packs 2/lane on the VPU. Numerically
    this matches the XLA bf16 path (whose einsums also produce bf16
    residuals), slightly better (fp32 matmul accumulation before each cast).

    Two VPU-pass eliminations (round 4; the decode is VPU-assembly-bound,
    DESIGN.md §9):
    - ``fold_b1``: prepare_projections_batched folded each block's fc_1 bias
      into the NEXT block's pxz projection, so the kernel skips the dx bias
      add for every block but the last — n_blocks-1 fewer full-width fp32
      passes. Exact up to fp32 add reassociation with fp32 projections
      (with bf16 projections the folded bias picks up bf16 rounding; see
      prepare_projections_batched).
    - ``hidden_bf16`` (bf16 compute only): the hidden stream is cast to
      bf16 right after the first dot's fp32-accumulated bias add (Mosaic
      requires 32-bit matmul accumulators, so the dot itself cannot emit
      bf16), so the hidden relu runs at bf16 width (2 elems/lane) and the
      pre-dot cast inside _mm disappears. Same class of rounding as the
      XLA bf16 path; the residual stream stays fp32. relu∘cast ==
      cast∘relu (rounding preserves sign), and the second dot still
      accumulates fp32.

    With ``transposed`` the head output is written (O, rows) — the flattened
    lattice rows on the lane dim — via a dot_general that contracts the
    activations' feature dim against a pre-transposed (O, F) head weight
    (wout_ref arrives (O, F) and bout_ref (O, 1) in this mode). Writing
    (rows, O) puts O=12 on the lane dim, and the TPU pads the minor dim to
    128 lanes: the (B, R^3, O) HBM buffer is then 2.1 GB physical for 98 MB
    of payload at B=64 — measured as ~5-7 ms/batch of pure padding traffic
    across the kernel write and every postprocess read (round-4 roofline;
    XLA cost model showed 9 GB accessed in the "+postprocess" stage).
    """
    R, F = py_ref.shape
    SX = px_ref.shape[0]
    res_t = jnp.bfloat16 if resident_bf16 else jnp.float32
    bf16_mm = compute_dtype == jnp.bfloat16

    net = (
        px_ref[:, 0][:, None, None, :]
        + py_ref[...][None, :, None, :]
        + pz_ref[...][None, None, :, :]
    ).astype(res_t)  # (SX, Ry, Rz, F); block-0 assembly stays fp32-exact
    for b in range(n_blocks):
        # projection refs may arrive bf16 (halves the dominant HBM traffic;
        # see prepare_projections_batched). fp32 mode casts straight off
        # the load (Mosaic can't shape-cast bf16 vectors, so the broadcast
        # reshapes must happen on the fp32 values); bf16-resident mode
        # broadcasts the bf16 values directly.
        # Mosaic cannot shape-cast bf16 vectors: index/squeeze/expand in
        # fp32, cast to the resident dtype only after the reshapes
        net = (
            net
            + pxz_ref[0, :, b].astype(jnp.float32)[:, None, :, :].astype(res_t)
            + pxy_ref[0, :, b].astype(jnp.float32)[:, :, None, :].astype(res_t)
            + pyz_ref[0, b].astype(jnp.float32)[None, :, :, :].astype(res_t)
        )
        flat = net.reshape(SX * R * R, F)
        if hidden_bf16 and bf16_mm:
            # fp32-accumulated dot + fp32 bias add, THEN cast (Mosaic's MXU
            # accumulates 32-bit; asking the dot itself to emit bf16 is not
            # portable) — the relu then runs at bf16 width (2 elems/lane)
            # and the second dot's pre-cast disappears. relu∘cast ==
            # cast∘relu (rounding preserves sign).
            a = jax.nn.relu(flat.astype(jnp.bfloat16))
            hidden = (jnp.dot(
                a, w0_ref[b].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) + b0_ref[b][None, :]).astype(jnp.bfloat16)
            dx = jnp.dot(
                jax.nn.relu(hidden), w1_ref[b].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            hidden = _mm(jax.nn.relu(flat), w0_ref[b], compute_dtype) + b0_ref[b][None, :]
            dx = _mm(jax.nn.relu(hidden), w1_ref[b], compute_dtype)
        if not fold_b1 or b == n_blocks - 1:
            dx = dx + b1_ref[b][None, :]
        net = (flat + dx.astype(res_t)).reshape(SX, R, R, F)
    flat = net.reshape(SX * R * R, F)
    a = jax.nn.relu(flat)
    if transposed:
        # (O, rows) write: contract F of the (O, F) pre-transposed weight
        # against F of the (rows, F) activations — the MXU absorbs the
        # operand transpose, so rows land on the lane dim with no VPU pass
        if compute_dtype == jnp.bfloat16:
            out = jax.lax.dot_general(
                wout_ref[...].astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            out = jax.lax.dot_general(
                wout_ref[...], a,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )
        out_ref[0] = out + bout_ref[...]  # (O, rows) + (O, 1)
    else:
        out_dim = out_ref.shape[-1]
        out = _mm(a, wout_ref[...], compute_dtype) + bout_ref[0][None, :]
        out_ref[0] = out.reshape(SX, R, R, out_dim)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "interpret", "x_slabs",
                              "resident_bf16", "fold_b1", "hidden_bf16",
                              "transposed")
)
def fused_dense_decode_batched(px, py, pz, pxz, pxy, pyz, w0, b0, w1, b1,
                               wout, bout, *, n_blocks: int = 5,
                               compute_dtype=jnp.float32, interpret: bool = False,
                               x_slabs: int = 8, resident_bf16: bool = False,
                               fold_b1: bool = False, hidden_bf16: bool = False,
                               transposed: bool = False):
    """Batched fused trunk: grid (B, Rx/x_slabs); the per-scene yz
    projection stays VMEM-resident across the inner x sweep (index_map
    depends only on b).

    Shapes: px/py/pz (R, F) shared across scenes;
    pxz/pxy/pyz (B, n_blocks, R, R, F); weights as in fused_dense_decode.
    Returns (B, R, R, R, O), or (B, O, R^3) with ``transposed`` (rows on
    the lane dim — kills the O=12 -> 128-lane padding traffic of the
    (..., O) layout; see _trunk_kernel_batched).
    """
    R, F = px.shape
    B = pxz.shape[0]
    O = wout.shape[-1]
    # largest slab group <= x_slabs that divides R (R=60 -> 6, R=80 -> 8)
    SX = next(s for s in range(min(x_slabs, R), 0, -1) if R % s == 0)
    kernel = functools.partial(
        _trunk_kernel_batched, n_blocks=n_blocks, compute_dtype=compute_dtype,
        resident_bf16=resident_bf16, fold_b1=fold_b1, hidden_bf16=hidden_bf16,
        transposed=transposed,
    )

    px3 = px[:, None, :]                  # (Rx, 1, F)
    pxz_t = pxz.transpose(0, 2, 1, 3, 4)  # (B, Rx, nb, Rz, F)
    pxy_t = pxy.transpose(0, 2, 1, 3, 4)  # (B, Rx, nb, Ry, F)

    def const(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    if transposed:
        head_w, head_b = wout.T, bout.reshape(O, 1)  # (O, F), (O, 1)
        head_specs = [const((O, F)), const((O, 1))]
        out_shape = jax.ShapeDtypeStruct((B, O, R * R * R), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, O, SX * R * R), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
        )
    else:
        head_w, head_b = wout, bout
        head_specs = [const((F, O)), const((1, O))]
        out_shape = jax.ShapeDtypeStruct((B, R, R, R, O), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, SX, R, R, O), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pl.GridSpec(
        grid=(B, R // SX),
        in_specs=[
            pl.BlockSpec((SX, 1, F), lambda b, i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((R, F)),
            const((R, F)),
            pl.BlockSpec((1, SX, n_blocks, R, F), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SX, n_blocks, R, F), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks, R, R, F), lambda b, i: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            *head_specs,
        ],
        out_specs=out_spec,
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        # headroom for the unrolled blocks (v5e has 128 MB of VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(px3, py, pz, pxz_t, pxy_t, pyz, w0, b0, w1, b1, head_w, head_b)


def _trunk_kernel_hybrid(px_ref, py_ref, pz_ref, fxz_ref, fxy_ref, pyz_ref,
                         wxz_ref, wxy_ref,
                         w0_ref, b0_ref, w1_ref, b1_ref, wout_ref, bout_ref,
                         out_ref, *, n_blocks: int, compute_dtype):
    """Per-(scene, x-slab) trunk with HYBRID projection sourcing.

    The projections-precompute kernel ships three (B, nb, R, R, F) tensors
    through HBM; with bf16 that round trip is still ~2.2 GB/batch and the
    decode stays bandwidth-bound. Only pyz is slab-INVARIANT (it must be
    resident across the x sweep) — pxz/pxy enter as single (R, C) raw
    feature rows and their per-block projections are two tiny (R, C) @
    (C, F) MXU matmuls per block (~2.5% more passes), cutting the decode's
    projection traffic by 2/3. fc_c biases are folded into pyz."""
    R, F = py_ref.shape
    out_dim = out_ref.shape[-1]

    net = (
        px_ref[0, 0][None, None, :]
        + py_ref[...][:, None, :]
        + pz_ref[...][None, :, :]
    )  # (Ry, Rz, F)
    fxz = fxz_ref[0, 0]  # (Rz, C) this x slab's xz-plane features
    fxy = fxy_ref[0, 0]  # (Ry, C)
    for b in range(n_blocks):
        rowz = _mm(fxz, wxz_ref[b], compute_dtype)  # (Rz, F)
        rowy = _mm(fxy, wxy_ref[b], compute_dtype)  # (Ry, F)
        net = (
            net
            + rowz[None, :, :]
            + rowy[:, None, :]
            + pyz_ref[0, b].astype(jnp.float32)
        )
        flat = net.reshape(R * R, F)
        hidden = _mm(jax.nn.relu(flat), w0_ref[b], compute_dtype) + b0_ref[b][None, :]
        dx = _mm(jax.nn.relu(hidden), w1_ref[b], compute_dtype) + b1_ref[b][None, :]
        net = (flat + dx).reshape(R, R, F)
    flat = net.reshape(R * R, F)
    out = _mm(jax.nn.relu(flat), wout_ref[...], compute_dtype) + bout_ref[0][None, :]
    out_ref[0, 0] = out.reshape(R, R, out_dim)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "interpret")
)
def fused_dense_decode_hybrid_batched(px, py, pz, fxz, fxy, pyz, wxz, wxy,
                                      w0, b0, w1, b1, wout, bout,
                                      *, n_blocks: int = 5,
                                      compute_dtype=jnp.float32,
                                      interpret: bool = False):
    """Batched hybrid fused trunk: grid (B, Rx).

    Shapes: px/py/pz (R, F); fxz/fxy (B, R, R, C) raw lattice plane
    features [b, first, second]; pyz (B, n_blocks, R, R, F) precomputed
    (fc_c biases folded in); wxz/wxy (nb, C, F). Returns (B, R, R, R, O).
    """
    R, F = px.shape
    B = pyz.shape[0]
    O = wout.shape[-1]
    kernel = functools.partial(
        _trunk_kernel_hybrid, n_blocks=n_blocks, compute_dtype=compute_dtype
    )

    px3 = px[:, None, :]  # (Rx, 1, F)

    def const(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B, R),
        in_specs=[
            pl.BlockSpec((1, 1, F), lambda b, i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((R, F)),
            const((R, F)),
            pl.BlockSpec((1, 1, R, C_ := fxz.shape[-1]), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, C_), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks, R, R, F), lambda b, i: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            const((n_blocks, C_, F)),
            const((n_blocks, C_, F)),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            const((F, O)),
            const((1, O)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, R, O), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, R, R, O), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(px3, py, pz, fxz, fxy, pyz, wxz, wxy, w0, b0, w1, b1, wout, bout)


def prepare_hybrid_inputs(dec_params: dict, feats: dict, coords, n_blocks: int = 5,
                          proj_dtype=jnp.float32):
    """Inputs for the hybrid kernel: separable fc_p terms, raw xz/xy plane
    features, precomputed per-block pyz (fc_c biases folded in), and the
    per-plane fc_c weight splits for the in-kernel row projections."""
    pk, e, h = _fused_head_weights(dec_params, n_blocks)
    px, py, pz = _prepare_axis_terms(pk, coords)

    c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
    wxz = jnp.stack([pk[f"fc_c{i}_kernel"][:c_dim] for i in range(n_blocks)])
    wxy = jnp.stack(
        [pk[f"fc_c{i}_kernel"][c_dim : 2 * c_dim] for i in range(n_blocks)]
    )
    pyz = jnp.stack(
        [
            jnp.einsum("qabc,ch->qabh", feats["yz"],
                       pk[f"fc_c{i}_kernel"][2 * c_dim :], precision=HI)
            + pk[f"fc_c{i}_bias"]
            for i in range(n_blocks)
        ],
        axis=1,
    )
    out = (
        px, py, pz, feats["xz"], feats["xy"], pyz, wxz, wxy,
        *_trunk_weight_stack(pk, n_blocks),
    )
    out = tuple(_as_f32(x) for x in out)
    if proj_dtype != jnp.float32:
        out = (out[:5] + (out[5].astype(proj_dtype),) + out[6:])
    return out


def decode_affordance_dense_pallas_hybrid_batched(dec_params: dict, feats: dict,
                                                  coords, n_blocks: int = 5,
                                                  compute_dtype=jnp.float32,
                                                  interpret: bool = False):
    """Batched affordance decode via the hybrid fused kernel.

    Returns qual (B,R,R,R), rot (B,R,R,R,4), width (B,R,R,R)."""
    inputs = prepare_hybrid_inputs(
        dec_params, feats, coords, n_blocks,
        proj_dtype=(jnp.bfloat16 if compute_dtype == jnp.bfloat16
                    else jnp.float32),
    )
    out = fused_dense_decode_hybrid_batched(
        *inputs, n_blocks=n_blocks, compute_dtype=compute_dtype,
        interpret=interpret,
    )
    return _split_heads(out, dec_params)


def _feats_kernel(px_ref, py_ref, pz_ref, fxz_ref, fxy_ref, fyz_ref,
                  wxz_ref, wxy_ref, wyz_ref, bc_ref,
                  w0_ref, b0_ref, w1_ref, b1_ref, wout_ref, bout_ref,
                  out_ref, *, n_blocks: int, compute_dtype):
    """Per-(scene, x-chunk) program computing the fc_c plane projections
    IN-KERNEL from the raw (C-wide) plane features.

    The projection-precompute design ships (B, nb, R, R, F) tensors per
    plane through HBM (~590 MB/batch at B=64) — 15x the trunk's own math
    time in bandwidth. Here the kernel reads only the raw features
    ((B, R, R, C), ~13 MB/plane/batch) and forms each block's projection as
    a (rows, C) @ (C, F) MXU matmul in VMEM: ~2% more FLOPs for ~45x less
    decode-stage HBM traffic.
    """
    CX, Rz, C = fxz_ref.shape[1:]
    Ry = fxy_ref.shape[2]
    F = py_ref.shape[-1]
    out_dim = out_ref.shape[-1]

    net = (
        px_ref[...][:, None, None, :]
        + py_ref[...][None, :, None, :]
        + pz_ref[...][None, None, :, :]
    )  # (CX, Ry, Rz, F)
    fxz = fxz_ref[0]  # (CX, Rz, C)
    fxy = fxy_ref[0]  # (CX, Ry, C)
    fyz = fyz_ref[0]  # (Ry, Rz, C)
    for b in range(n_blocks):
        pxz = _mm(fxz.reshape(CX * Rz, C), wxz_ref[b], compute_dtype)
        pxy = _mm(fxy.reshape(CX * Ry, C), wxy_ref[b], compute_dtype)
        pyz = _mm(fyz.reshape(Ry * Rz, C), wyz_ref[b], compute_dtype)
        net = (
            net
            + pxz.reshape(CX, 1, Rz, F)
            + pxy.reshape(CX, Ry, 1, F)
            + pyz.reshape(1, Ry, Rz, F)
            + bc_ref[b][None, None, None, :]
        )
        flat = net.reshape(CX * Ry * Rz, F)
        hidden = _mm(jax.nn.relu(flat), w0_ref[b], compute_dtype) + b0_ref[b][None, :]
        dx = _mm(jax.nn.relu(hidden), w1_ref[b], compute_dtype) + b1_ref[b][None, :]
        net = (flat + dx).reshape(CX, Ry, Rz, F)
    flat = net.reshape(CX * Ry * Rz, F)
    out = _mm(jax.nn.relu(flat), wout_ref[...], compute_dtype) + bout_ref[0][None, :]
    out_ref[0] = out.reshape(CX, Ry, Rz, out_dim)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "compute_dtype", "x_chunk", "interpret")
)
def fused_dense_decode_feats_batched(px, py, pz, fxz, fxy, fyz,
                                     wxz, wxy, wyz, bc,
                                     w0, b0, w1, b1, wout, bout,
                                     *, n_blocks: int = 5,
                                     compute_dtype=jnp.float32,
                                     x_chunk: int = 8,
                                     interpret: bool = False):
    """Batched fused trunk from RAW plane features: grid (B, R/x_chunk).

    Shapes: px/py/pz (R, F) (fc_p bias folded into px);
    fxz/fxy/fyz (B, R, R, C) lattice plane features, [b, first, second];
    wxz/wxy/wyz (nb, C, F) per-plane fc_c splits; bc (nb, F) fc_c biases;
    trunk weights as in fused_dense_decode. Returns (B, R, R, R, O).
    """
    R, F = px.shape
    B, _, _, C = fxz.shape
    O = wout.shape[-1]
    assert R % x_chunk == 0, (R, x_chunk)
    kernel = functools.partial(
        _feats_kernel, n_blocks=n_blocks, compute_dtype=compute_dtype
    )

    def const(shape):
        return pl.BlockSpec(shape, lambda q, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B, R // x_chunk),
        in_specs=[
            pl.BlockSpec((x_chunk, F), lambda q, i: (i, 0), memory_space=pltpu.VMEM),
            const((R, F)),
            const((R, F)),
            pl.BlockSpec((1, x_chunk, R, C), lambda q, i: (q, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, x_chunk, R, C), lambda q, i: (q, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, R, C), lambda q, i: (q, 0, 0, 0), memory_space=pltpu.VMEM),
            const((n_blocks, C, F)),
            const((n_blocks, C, F)),
            const((n_blocks, C, F)),
            const((n_blocks, F)),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            const((n_blocks, F, F)),
            const((n_blocks, F)),
            const((F, O)),
            const((1, O)),
        ],
        out_specs=pl.BlockSpec(
            (1, x_chunk, R, R, O), lambda q, i: (q, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, R, R, O), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(px, py, pz, fxz, fxy, fyz, wxz, wxy, wyz, bc,
      w0, b0, w1, b1, wout, bout)


def prepare_feats_inputs(dec_params: dict, feats: dict, coords, n_blocks: int = 5):
    """Kernel inputs for the raw-features variant: separable fc_p terms,
    the (B, R, R, C) plane features as-is, and per-plane fc_c weight splits."""
    pk, e, h = _fused_head_weights(dec_params, n_blocks)
    px, py, pz = _prepare_axis_terms(pk, coords)

    c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
    wxz = jnp.stack([pk[f"fc_c{i}_kernel"][:c_dim] for i in range(n_blocks)])
    wxy = jnp.stack(
        [pk[f"fc_c{i}_kernel"][c_dim : 2 * c_dim] for i in range(n_blocks)]
    )
    wyz = jnp.stack([pk[f"fc_c{i}_kernel"][2 * c_dim :] for i in range(n_blocks)])
    bc = jnp.stack([pk[f"fc_c{i}_bias"] for i in range(n_blocks)])
    out = (
        px, py, pz, feats["xz"], feats["xy"], feats["yz"], wxz, wxy, wyz, bc,
        *_trunk_weight_stack(pk, n_blocks),
    )
    return tuple(_as_f32(x) for x in out)


def decode_affordance_dense_pallas_feats_batched(dec_params: dict, feats: dict,
                                                 coords, n_blocks: int = 5,
                                                 compute_dtype=jnp.float32,
                                                 x_chunk: int = 8,
                                                 interpret: bool = False):
    """Batched affordance decode via the raw-features fused kernel.

    Returns qual (B,R,R,R), rot (B,R,R,R,4), width (B,R,R,R)."""
    inputs = prepare_feats_inputs(dec_params, feats, coords, n_blocks)
    out = fused_dense_decode_feats_batched(
        *inputs, n_blocks=n_blocks, compute_dtype=compute_dtype,
        x_chunk=x_chunk, interpret=interpret,
    )
    return _split_heads(out, dec_params)


def _as_f32(x):
    return x.astype(jnp.float32)


def prepare_projections(dec_params: dict, feats: dict, coords, n_blocks: int = 5):
    """Precompute the broadcast pieces the kernel consumes (tiny einsums), in
    the fused-head space. feats: {t: (R, R, C)} per-plane lattice features,
    [first_axis, second_axis]. Returns the 12-tuple of fp32 kernel inputs.
    """
    pk, e, h = _fused_head_weights(dec_params, n_blocks)
    px, py, pz = _prepare_axis_terms(pk, coords)

    c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
    pxz, pxy, pyz = [], [], []
    for i in range(n_blocks):
        w_c = pk[f"fc_c{i}_kernel"]  # (3c, F)
        pxz.append(
            jnp.einsum("abc,ch->abh", feats["xz"], w_c[:c_dim], precision=HI)
            + pk[f"fc_c{i}_bias"]
        )
        pxy.append(
            jnp.einsum("abc,ch->abh", feats["xy"], w_c[c_dim : 2 * c_dim], precision=HI)
        )
        pyz.append(
            jnp.einsum("abc,ch->abh", feats["yz"], w_c[2 * c_dim :], precision=HI)
        )
    out = (
        px, py, pz, jnp.stack(pxz), jnp.stack(pxy), jnp.stack(pyz),
        *_trunk_weight_stack(pk, n_blocks),
    )
    # refs stay fp32 regardless of serving dtype: broadcasts/adds are exact,
    # the kernel casts at the MXU dots only
    return tuple(_as_f32(x) for x in out)


def prepare_projections_batched(dec_params: dict, feats: dict, coords, n_blocks: int = 5,
                                proj_dtype=jnp.float32, fold_b1: bool = False):
    """Batched projection precompute: feats {t: (B, R, R, C)} ->
    px/py/pz (R, F) + pxz/pxy/pyz (B, n_blocks, R, R, F) + fused weights.

    ``proj_dtype=bf16`` stores the three (B, nb, R, R, F) projection tensors
    in bf16: at B=64 they are ~4.5 GB of round-trip HBM traffic and the
    measured bottleneck of the batched decode (12.9 of 25.8 ms/batch,
    round-3 roofline) — halving their bytes buys ~6 ms/batch, while the
    kernel still accumulates fp32.

    ``fold_b1`` additionally folds block b's fc_1 bias into block b+1's pxz
    (the kernel then skips the dx bias add for b < n_blocks-1 — one fewer
    full-width VPU pass per folded block; the decode is VPU-bound). Exact up
    to fp32 add reassociation ONLY for fp32 projections: with
    ``proj_dtype=bf16`` the folded bias picks up the projection's bf16
    rounding that the in-kernel fp32 bias add would not (within the tested
    2e-2 bf16 gate)."""
    pk, e, h = _fused_head_weights(dec_params, n_blocks)
    px, py, pz = _prepare_axis_terms(pk, coords)

    c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
    pxz, pxy, pyz = [], [], []
    for i in range(n_blocks):
        w_c = pk[f"fc_c{i}_kernel"]
        bias = pk[f"fc_c{i}_bias"]
        if fold_b1 and i > 0:
            bias = bias + pk[f"block{i - 1}_fc1_bias"]
        pxz.append(
            jnp.einsum("qabc,ch->qabh", feats["xz"], w_c[:c_dim], precision=HI)
            + bias
        )
        pxy.append(
            jnp.einsum("qabc,ch->qabh", feats["xy"], w_c[c_dim : 2 * c_dim], precision=HI)
        )
        pyz.append(
            jnp.einsum("qabc,ch->qabh", feats["yz"], w_c[2 * c_dim :], precision=HI)
        )
    out = (
        px, py, pz,
        jnp.stack(pxz, axis=1), jnp.stack(pxy, axis=1), jnp.stack(pyz, axis=1),
        *_trunk_weight_stack(pk, n_blocks),
    )
    out = tuple(_as_f32(x) for x in out)
    if proj_dtype != jnp.float32:
        out = (out[:3] + tuple(x.astype(proj_dtype) for x in out[3:6])
               + out[6:])
    return out


def _split_heads(out, dec_params):
    """(..., R, R, R, heads*o) -> qual/rot/width with reference semantics."""
    e, _, h = dec_params["fc_p_kernel"].shape
    o = dec_params["fc_out_bias"].shape[-1]
    parts = out.reshape(out.shape[:-1] + (e, o))
    qual = jax.nn.sigmoid(parts[..., 0, 0])
    rot = parts[..., 1, :]
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
    width = parts[..., 2, 0]
    return qual, rot, width


def _split_heads_transposed(out_t, dec_params, R: int):
    """(B, heads*o, R^3) transposed kernel output -> qual (B,R,R,R),
    rot (B, 4, R^3) KEPT TRANSPOSED (re-laying it out as (..., 4) would
    rebuild the 4 -> 128-lane padded buffer the transposed write avoids;
    select_grasps_batched gathers top-k columns directly), width (B,R,R,R).
    """
    e, _, h = dec_params["fc_p_kernel"].shape
    o = dec_params["fc_out_bias"].shape[-1]
    B, O, N = out_t.shape
    assert O == e * o and N == R ** 3, (out_t.shape, e, o, R)
    parts = out_t.reshape(B, e, o, N)
    qual = jax.nn.sigmoid(parts[:, 0, 0]).reshape(B, R, R, R)
    rot = parts[:, 1]  # (B, 4, N)
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=1, keepdims=True), 1e-12)
    width = parts[:, 2, 0].reshape(B, R, R, R)
    return qual, rot, width


def decode_affordance_dense_pallas(dec_params: dict, feats: dict, coords,
                                   n_blocks: int = 5, compute_dtype=jnp.float32,
                                   interpret: bool = False):
    """Drop-in replacement for decode_affordance_dense using the fused kernel.

    Returns qual (R,R,R), rot (R,R,R,4), width (R,R,R)."""
    inputs = prepare_projections(dec_params, feats, coords, n_blocks)
    out = fused_dense_decode(
        *inputs, n_blocks=n_blocks, compute_dtype=compute_dtype, interpret=interpret
    )
    return _split_heads(out, dec_params)


def decode_affordance_dense_pallas_batched(dec_params: dict, feats: dict, coords,
                                           n_blocks: int = 5,
                                           compute_dtype=jnp.float32,
                                           interpret: bool = False,
                                           resident_bf16: bool | None = None,
                                           fold_b1: bool = False,
                                           hidden_bf16: bool = False,
                                           transposed: bool = False):
    """Batched drop-in for decode_affordance_dense_batched via the fused kernel.

    ``resident_bf16`` keeps the residual stream bf16 inside the kernel —
    MEASURED SLOWER (17.8 vs 15.8 ms/batch encode+decode at B=64, round 4):
    Mosaic cannot shape-cast bf16 vectors, so every projection must be
    indexed/broadcast in fp32 and cast after, and those full-width casts
    cost more than the bf16 elementwise saves. Kept for re-evaluation on
    future Mosaic versions; default off.

    ``fold_b1`` / ``hidden_bf16`` are VPU-pass eliminations (see
    _trunk_kernel_batched); fold_b1 is exact up to fp32 reassociation,
    hidden_bf16 applies only in bf16 compute mode.

    ``transposed`` writes the head output (O, rows) — lattice rows on the
    lane dim — eliminating the (..., O=12) 128-lane padding traffic. rot is
    then returned TRANSPOSED as (B, 4, R^3) (postprocess gathers columns).
    Returns qual (B,R,R,R), rot (B,R,R,R,4) or (B,4,R^3), width (B,R,R,R)."""
    bf16 = compute_dtype == jnp.bfloat16
    if resident_bf16 is None:
        resident_bf16 = False
    inputs = prepare_projections_batched(
        dec_params, feats, coords, n_blocks,
        proj_dtype=(jnp.bfloat16 if bf16 else jnp.float32),
        fold_b1=fold_b1,
    )
    out = fused_dense_decode_batched(
        *inputs, n_blocks=n_blocks, compute_dtype=compute_dtype,
        interpret=interpret, resident_bf16=bool(resident_bf16 and bf16),
        fold_b1=fold_b1, hidden_bf16=bool(hidden_bf16 and bf16),
        transposed=transposed,
    )
    if transposed:
        return _split_heads_transposed(out, dec_params, coords.shape[0])
    return _split_heads(out, dec_params)

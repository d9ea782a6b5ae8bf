"""Dense grasp-grid decoding with lattice factorization.

The planner queries the implicit decoders at the full R^3 lattice of cell
corners (reference: detection_implicit.py:28-31). Two structural facts make
this far cheaper than a generic N-point decode:

  1. Each triplane feature depends on only two of the three query coordinates,
     so the bilinear sampling runs on three R^2 lattices (3*1600 points)
     instead of R^3 (64000), via exact interpolation-matrix matmuls (MXU).
  2. The decoder's per-block feature projections fc_c[i](c) are linear in the
     concatenated feature, so they split into three per-plane projections
     computed on the R^2 lattices and broadcast-added into the R^3 hidden
     state - a ~40x FLOP reduction on every projection. Only the ResnetBlockFC
     trunk (nonlinear) runs on the full R^3 x hidden state.

Numerics are exactly the reference decode (same weights, same order of
adds within each block input), verified against the gather-path module apply.

Functions are pure (params pytree in, arrays out) so the planner can jit and
shard them without linen indirection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from giga_tpu.ops.sampling import interp_matrix_1d, sample_plane_lattice

HI = jax.lax.Precision.HIGHEST


def lattice_coords(resolution: int) -> jnp.ndarray:
    """Planner query coords: linspace(-0.5, 0.5 - 1/R, R) per axis."""
    return jnp.linspace(-0.5, 0.5 - 1.0 / resolution, resolution, dtype=jnp.float32)


def sample_planes_on_lattice(planes: dict, coords: jnp.ndarray, plane_reso: int, padding: float):
    """Sample each (H, W, C) plane on the coords x coords query lattice.

    Returns {t: (R, R, C)} indexed [first_axis_query, second_axis_query, C]
    (e.g. planes['xz'][ix, iz]).
    """
    m = interp_matrix_1d(coords, plane_reso, padding)
    m = m.astype(next(iter(planes.values())).dtype)  # keep bf16 trunks bf16
    out = {}
    for t, plane in planes.items():
        # sample_plane_lattice returns [row_q, col_q, C]; row = second plane
        # axis, col = first -> transpose to [first, second, C]
        out[t] = sample_plane_lattice(plane, m, m).transpose(1, 0, 2)
    return out


def _linear(x, kernel, bias, precision=HI):
    return jnp.einsum("...c,ck->...k", x, kernel, precision=precision) + bias


def _fused_head_weights(dec_params: dict, n_blocks: int):
    """Repack the stacked per-head decoder weights into one concatenated
    feature space F = heads*hidden.

    The MXU is a 128x128 systolic array; the per-head trunk matmuls are
    (N, 32) @ (32, 32) and use ~6% of it. Concatenating the three heads'
    hidden states and running the trunk with block-diagonal (96, 96) weights
    raises utilization ~9x for 3x the (cheap) FLOPs — and is numerically
    EXACT: the off-diagonal blocks are zero, and x + 0*y == x in fp (the
    cross-head partial products are exactly 0.0, so the accumulated sums are
    the same values the per-head matmuls produce).

    Shared-input projections (fc_c per plane, fc_p) concatenate along the
    output axis only — no zero padding, no extra FLOPs.
    """
    from jax.scipy.linalg import block_diag

    e, _, h = dec_params["fc_p_kernel"].shape

    def bd(w):  # (e, a, b) -> (e*a, e*b) block-diagonal
        return block_diag(*[w[i] for i in range(e)])

    def cat_out(w):  # (e, c, h) shared-input -> (c, e*h)
        return jnp.concatenate([w[i] for i in range(e)], axis=-1)

    packed = {
        "fc_p_kernel": cat_out(dec_params["fc_p_kernel"]),  # (3, e*h)
        "fc_p_bias": dec_params["fc_p_bias"].reshape(-1),  # (e*h,)
        "fc_out_kernel": bd(dec_params["fc_out_kernel"]),  # (e*h, e*o)
        "fc_out_bias": dec_params["fc_out_bias"].reshape(-1),
    }
    for i in range(n_blocks):
        packed[f"fc_c{i}_kernel"] = cat_out(dec_params[f"fc_c{i}_kernel"])
        packed[f"fc_c{i}_bias"] = dec_params[f"fc_c{i}_bias"].reshape(-1)
        packed[f"block{i}_fc0_kernel"] = bd(dec_params[f"block{i}_fc0_kernel"])
        packed[f"block{i}_fc0_bias"] = dec_params[f"block{i}_fc0_bias"].reshape(-1)
        packed[f"block{i}_fc1_kernel"] = bd(dec_params[f"block{i}_fc1_kernel"])
        packed[f"block{i}_fc1_bias"] = dec_params[f"block{i}_fc1_bias"].reshape(-1)
    return packed, e, h


def decode_dense(dec_params: dict, feats: dict, coords: jnp.ndarray, n_blocks: int = 5,
                 shard_constraint=None):
    """Run the stacked decoder heads on the full R^3 lattice.

    A unit-batch wrapper over ``decode_dense_batched`` — one trunk
    implementation serves both paths (the B=1 broadcast adds/squeezes a
    leading axis of extent 1, which XLA folds away; numerics and the fused
    block-diagonal trunk are identical).

    Args:
        dec_params: a StackedLocalDecoder param dict (heads axis first).
        feats: {t: (R, R, C)} per-plane lattice features from
            ``sample_planes_on_lattice``.
        coords: (R,) per-axis query coordinates.
        shard_constraint: optional NamedSharding applied to the (Rx, Ry,
            Rz, F) hidden state — sharding the x axis over a device mesh
            makes GSPMD partition the whole trunk (the decode is a pure map
            over queries; plane features are tiny and replicate).
    Returns:
        (heads, R, R, R, out_dim) raw outputs, indexed [h, ix, iy, iz, o].
    """
    if shard_constraint is not None:
        # the batched hidden state has a leading unit batch axis; keep the
        # caller's per-axis spec aligned by prepending an unsharded dim
        from jax.sharding import NamedSharding, PartitionSpec

        shard_constraint = NamedSharding(
            shard_constraint.mesh, PartitionSpec(None, *shard_constraint.spec)
        )
    out = decode_dense_batched(
        dec_params, {t: v[None] for t, v in feats.items()}, coords, n_blocks,
        shard_constraint,
    )
    return out[:, 0]


def decode_lattice_points(dec_params: dict, feats: dict, coords: jnp.ndarray,
                          ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray,
                          n_blocks: int = 5):
    """Run the stacked decoder at sparse lattice points (index triples).

    The sparse counterpart of ``decode_dense`` for points that lie ON the
    query lattice but are too few to justify the full R^3 volume: per-plane
    features are gathered once as (N, C) rows from the 2D lattice maps
    (each gather reads one contiguous C-float row), then the identical
    fused-head FC trunk runs on the (N, F) matrix. This is the workhorse of
    the device-side hierarchical surface refinement
    (geometry/generation.py; role of the reference's MISE octree,
    ConvONets/utils/libmise/mise.pyx:33-44).

    Args:
        feats: {t: (R, R, C)} from ``sample_planes_on_lattice`` (or
            {'dense': (R, R, R, C)} for the grid variant).
        ix/iy/iz: (N,) int indices into ``coords`` per axis.
    Returns:
        (heads, N, out_dim) raw outputs.
    """
    pk, heads, h = _fused_head_weights(dec_params, n_blocks)
    coords = coords.astype(pk["fc_p_kernel"].dtype)
    x, y, z = coords[ix], coords[iy], coords[iz]
    w_p = pk["fc_p_kernel"]  # (3, F)
    net = (
        x[:, None] * w_p[0] + y[:, None] * w_p[1] + z[:, None] * w_p[2]
        + pk["fc_p_bias"]
    )  # (N, F)

    dense = feats.get("dense")
    if dense is None:
        c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
        fxz = feats["xz"][ix, iz]  # (N, C)
        fxy = feats["xy"][ix, iy]
        fyz = feats["yz"][iy, iz]
    else:
        fd = dense[ix, iy, iz]

    for i in range(n_blocks):
        w_c = pk[f"fc_c{i}_kernel"]
        b_c = pk[f"fc_c{i}_bias"]
        if dense is not None:
            net = net + jnp.einsum("nc,ch->nh", fd, w_c, precision=HI) + b_c
        else:
            w_xz, w_xy, w_yz = (
                w_c[:c_dim], w_c[c_dim : 2 * c_dim], w_c[2 * c_dim :]
            )
            net = (
                net
                + jnp.einsum("nc,ch->nh", fxz, w_xz, precision=HI)
                + jnp.einsum("nc,ch->nh", fxy, w_xy, precision=HI)
                + jnp.einsum("nc,ch->nh", fyz, w_yz, precision=HI)
                + b_c
            )
        hid = jnp.einsum(
            "nk,kj->nj", jax.nn.relu(net), pk[f"block{i}_fc0_kernel"],
            precision=HI,
        ) + pk[f"block{i}_fc0_bias"]
        dx = jnp.einsum(
            "nk,kj->nj", jax.nn.relu(hid), pk[f"block{i}_fc1_kernel"],
            precision=HI,
        ) + pk[f"block{i}_fc1_bias"]
        net = net + dx

    out = jnp.einsum(
        "nk,ko->no", jax.nn.relu(net), pk["fc_out_kernel"], precision=HI
    ) + pk["fc_out_bias"]  # (N, heads*o)
    o = dec_params["fc_out_bias"].shape[-1]
    return out.reshape(-1, heads, o).transpose(1, 0, 2)


def sample_planes_on_lattice_batched(planes: dict, coords: jnp.ndarray, plane_reso: int,
                                     padding: float):
    """Batched lattice sampling: {t: (B, H, W, C)} -> {t: (B, R, R, C)}
    indexed [b, first_axis_query, second_axis_query, C]."""
    m = interp_matrix_1d(coords, plane_reso, padding)
    m = m.astype(next(iter(planes.values())).dtype)
    out = {}
    for t, plane in planes.items():
        s = jnp.einsum("rh,bhwc->brwc", m, plane, precision=HI)
        s = jnp.einsum("qw,brwc->brqc", m, s, precision=HI)
        out[t] = s.transpose(0, 2, 1, 3)  # [b, row, col] -> [b, first, second]
    return out


def decode_dense_batched(dec_params: dict, feats: dict, coords: jnp.ndarray,
                         n_blocks: int = 5, shard_constraint=None):
    """Batched ``decode_dense``: one program over B scenes, no vmap.

    feats: {t: (B, R, R, C)} per-plane lattice features (or
    {'dense': (B, R, R, R, C)} for the grid variant).
    Returns (heads, B, R, R, R, out_dim).
    """
    dense = feats.get("dense")
    if dense is None:
        c_dim = dec_params["fc_c0_kernel"].shape[1] // 3
        fxz, fxy, fyz = feats["xz"], feats["xy"], feats["yz"]
        B = fxz.shape[0]
    else:
        B = dense.shape[0]
    R = coords.shape[0]
    pk, heads, h = _fused_head_weights(dec_params, n_blocks)
    coords = coords.astype(pk["fc_p_kernel"].dtype)

    w_p = pk["fc_p_kernel"]  # (3, F)
    px = jnp.einsum("r,k->rk", coords, w_p[0], precision=HI)
    py = jnp.einsum("r,k->rk", coords, w_p[1], precision=HI)
    pz = jnp.einsum("r,k->rk", coords, w_p[2], precision=HI)
    net = (
        px[None, :, None, None, :]
        + py[None, None, :, None, :]
        + pz[None, None, None, :, :]
        + pk["fc_p_bias"]
    )  # (1, Rx, Ry, Rz, F), broadcasts against B below
    net = jnp.broadcast_to(net, (B,) + net.shape[1:])
    if shard_constraint is not None:
        net = jax.lax.with_sharding_constraint(net, shard_constraint)

    def block(net, i):
        w_c = pk[f"fc_c{i}_kernel"]
        b_c = pk[f"fc_c{i}_bias"]
        if dense is not None:
            proj = jnp.einsum("bxyzf,fh->bxyzh", dense, w_c, precision=HI)
            net = net + proj + b_c
        else:
            w_xz, w_xy, w_yz = (
                w_c[:c_dim], w_c[c_dim : 2 * c_dim], w_c[2 * c_dim :]
            )
            pxz = jnp.einsum("bxzc,ch->bxzh", fxz, w_xz, precision=HI)
            pxy = jnp.einsum("bxyc,ch->bxyh", fxy, w_xy, precision=HI)
            pyz = jnp.einsum("byzc,ch->byzh", fyz, w_yz, precision=HI)
            net = (
                net
                + pxz[:, :, None, :, :]
                + pxy[:, :, :, None, :]
                + pyz[:, None, :, :, :]
                + b_c
            )
        hid = jnp.einsum(
            "...k,kj->...j", jax.nn.relu(net), pk[f"block{i}_fc0_kernel"],
            precision=HI,
        ) + pk[f"block{i}_fc0_bias"]
        dx = jnp.einsum(
            "...k,kj->...j", jax.nn.relu(hid), pk[f"block{i}_fc1_kernel"],
            precision=HI,
        ) + pk[f"block{i}_fc1_bias"]
        return net + dx

    for i in range(n_blocks):
        net = block(net, i)

    out = jnp.einsum(
        "...k,ko->...o", jax.nn.relu(net), pk["fc_out_kernel"], precision=HI
    ) + pk["fc_out_bias"]  # (B, R, R, R, heads*o)
    o = dec_params["fc_out_bias"].shape[-1]
    return out.reshape(B, R, R, R, heads, o).transpose(4, 0, 1, 2, 3, 5)


def decode_affordance_dense_batched(dec_params: dict, feats: dict, coords: jnp.ndarray,
                                    n_blocks: int = 5, shard_constraint=None):
    """Batched (qual, rot, width): (B,R,R,R), (B,R,R,R,4), (B,R,R,R)."""
    out = decode_dense_batched(dec_params, feats, coords, n_blocks, shard_constraint)
    qual = jax.nn.sigmoid(out[0, ..., 0])
    rot = out[1]
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
    width = out[2, ..., 0]
    return qual, rot, width


def decode_affordance_dense(dec_params: dict, feats: dict, coords: jnp.ndarray, n_blocks: int = 5,
                            shard_constraint=None):
    """(qual, rot, width) volumes from the stacked affordance decoder.

    qual: (R,R,R) sigmoid; rot: (R,R,R,4) normalized; width: (R,R,R).
    """
    out = decode_dense(dec_params, feats, coords, n_blocks, shard_constraint)
    qual = jax.nn.sigmoid(out[0, ..., 0])
    rot = out[1]
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
    width = out[2, ..., 0]
    return qual, rot, width

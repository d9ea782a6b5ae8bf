"""Pallas fused-decoder kernel parity (interpreter mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from giga_tpu.inference.dense_decode import (
    decode_affordance_dense,
    lattice_coords,
    sample_planes_on_lattice,
)
from giga_tpu.models.registry import get_network
from giga_tpu.ops.pallas.decoder_kernel import decode_affordance_dense_pallas


def test_fused_kernel_matches_xla_path():
    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf, p, p)
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.rand(1, 40, 40, 40).astype(np.float32))
    planes = {t: v[0] for t, v in net.apply(params, grid, method="encode").items()}
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas(dp, feats, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_batched_fused_kernel_matches_xla_path():
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_batched,
    )

    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf, p, p)
    rng = np.random.RandomState(1)
    grids = jnp.asarray(rng.rand(3, 40, 40, 40).astype(np.float32))
    planes = net.apply(params, grids, method="encode")
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense_batched(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas_batched(dp, feats, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_batched_fused_kernel_bf16_close_to_fp32():
    """The bf16 compute mode (the TPU batched-serving default) must stay
    within bf16 rounding of the fp32 path — the assembly stays fp32-exact,
    only the MXU dots are cast."""
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_batched,
    )

    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(2), tsdf, p, p)
    rng = np.random.RandomState(3)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))
    planes = net.apply(params, grids, method="encode")
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense_batched(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas_batched(
        dp, feats, coords, compute_dtype=jnp.bfloat16, interpret=True
    )
    # qual is post-sigmoid in [0, 1]; bf16 matmuls move it by < 2e-2
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-2)
    assert np.median(np.abs(np.asarray(q1) - np.asarray(q2))) < 3e-3


def test_feats_kernel_matches_xla_path():
    """Raw-features variant (in-kernel fc_c projections) == XLA batched path."""
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_feats_batched,
    )

    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(2), tsdf, p, p)
    rng = np.random.RandomState(2)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))
    planes = net.apply(params, grids, method="encode")
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense_batched(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas_feats_batched(
        dp, feats, coords, interpret=True
    )
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_hybrid_kernel_matches_xla_path():
    """Hybrid variant (pyz precomputed, pxz/pxy rows in-kernel) == XLA."""
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_hybrid_batched,
    )

    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(3), tsdf, p, p)
    rng = np.random.RandomState(3)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))
    planes = net.apply(params, grids, method="encode")
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense_batched(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas_hybrid_batched(
        dp, feats, coords, interpret=True
    )
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_batched_kernel_fold_b1_matches_xla_path():
    """fold_b1 moves each block's fc_1 bias into the next block's pxz
    projection (one fewer VPU pass per block) — exact up to fp32
    reassociation."""
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_batched,
    )

    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(4), tsdf, p, p)
    rng = np.random.RandomState(4)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))
    planes = net.apply(params, grids, method="encode")
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense_batched(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas_batched(
        dp, feats, coords, interpret=True, fold_b1=True
    )
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_batched_kernel_transposed_matches_xla_path():
    """Transposed (O, rows) head write: same numbers as the XLA path, with
    rot returned in the (B, 4, R^3) lane-friendly layout."""
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_batched,
    )

    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(5), tsdf, p, p)
    rng = np.random.RandomState(5)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))
    planes = net.apply(params, grids, method="encode")
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense_batched(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas_batched(
        dp, feats, coords, interpret=True, transposed=True
    )
    assert r2.shape == (2, 4, 40 ** 3)
    r2_std = np.asarray(r2).reshape(2, 4, 40, 40, 40).transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), r2_std, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_select_grasps_batched_accepts_transposed_rot():
    """select_grasps_batched must yield identical candidates for rot given
    as (B, R, R, R, 4) or as the transposed (B, 4, R^3) layout."""
    from giga_tpu.core.config import PlannerConfig
    from giga_tpu.inference.postprocess import select_grasps_batched

    rng = np.random.RandomState(7)
    B, R = 2, 8
    qual = jnp.asarray(rng.rand(B, R, R, R).astype(np.float32))
    rot = rng.randn(B, R, R, R, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    width = jnp.asarray(rng.rand(B, R, R, R).astype(np.float32))
    x, y, z = np.meshgrid(*([np.arange(R, dtype=np.float32)] * 3), indexing="ij")
    positions = jnp.asarray(np.stack([x, y, z], -1))
    cfg = PlannerConfig(force_detection=True, max_grasps=16)

    rot_t = jnp.asarray(rot.reshape(B, R ** 3, 4).transpose(0, 2, 1))
    c1 = select_grasps_batched(qual, jnp.asarray(rot), width, positions, cfg)
    c2 = select_grasps_batched(qual, rot_t, width, positions, cfg)
    for a, b in zip(c1, c2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_batched_kernel_vpu_opts_bf16_close_to_fp32():
    """fold_b1 + hidden_bf16 under bf16 compute stays within bf16 rounding
    of the fp32 XLA path (same gate as the plain bf16 kernel)."""
    from giga_tpu.inference.dense_decode import (
        decode_affordance_dense_batched,
        sample_planes_on_lattice_batched,
    )
    from giga_tpu.ops.pallas.decoder_kernel import (
        decode_affordance_dense_pallas_batched,
    )

    net, cfg = get_network("giga")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 4, 3))
    params = net.init(jax.random.PRNGKey(2), tsdf, p, p)
    rng = np.random.RandomState(3)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))
    planes = net.apply(params, grids, method="encode")
    coords = lattice_coords(40)
    feats = sample_planes_on_lattice_batched(planes, coords, 40, 0.0)
    dp = params["params"]["decoder_aff"]

    q1, r1, w1 = decode_affordance_dense_batched(dp, feats, coords)
    q2, r2, w2 = decode_affordance_dense_pallas_batched(
        dp, feats, coords, compute_dtype=jnp.bfloat16, interpret=True,
        fold_b1=True, hidden_bf16=True,
    )
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-2)
    assert np.median(np.abs(np.asarray(q1) - np.asarray(q2))) < 3e-3

"""PointNet++ encoder tests (FPS, ball query, SA/FP stack)."""

import numpy as np

import jax
import jax.numpy as jnp

from giga_tpu.models.pointnetpp import (
    PointNetPlusPlus,
    ball_query,
    farthest_point_sample,
    square_distance,
)


def test_square_distance():
    rng = np.random.RandomState(0)
    a = rng.randn(1, 5, 3).astype(np.float32)
    b = rng.randn(1, 7, 3).astype(np.float32)
    d2 = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    golden = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, golden, atol=1e-4)


def test_fps_spreads_points():
    # two well-separated clusters: FPS must pick from both
    rng = np.random.RandomState(1)
    a = rng.uniform(0, 0.1, (64, 3))
    b = rng.uniform(0.9, 1.0, (64, 3))
    pts = jnp.asarray(np.concatenate([a, b])[None], jnp.float32)
    idx = np.asarray(farthest_point_sample(pts, 8))[0]
    assert len(set(idx.tolist())) == 8
    assert np.any(idx < 64) and np.any(idx >= 64)


def test_ball_query_respects_radius():
    pts = jnp.asarray(
        np.array([[[0, 0, 0], [0.05, 0, 0], [1, 1, 1], [0.02, 0.02, 0]]], np.float32)
    )
    centers = pts[:, :1]
    idx = np.asarray(ball_query(0.1, 3, pts, centers))[0, 0]
    # the far point (index 2) must not appear
    assert 2 not in idx.tolist()


def test_pointnetpp_forward_and_grad():
    net = PointNetPlusPlus(c_dim=16)
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 600, 3)), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), xyz)
    # jit everything: the FPS lax.scan is hundreds of per-op dispatches when
    # run eagerly (this test alone cost 76 s of the suite)
    _, feats = jax.jit(net.apply)(variables, xyz)
    assert feats.shape == (1, 600, 16)

    def loss(v):
        _, f = net.apply(v, xyz)
        return jnp.sum(f**2)

    g = jax.jit(jax.grad(loss))(variables)
    total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert np.isfinite(float(total))

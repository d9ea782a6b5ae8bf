"""PointNet++ per-point feature extractor
(reference: ConvONets/encoder/pointnetpp.py:105-130, from the standard
set-abstraction / feature-propagation architecture).

JAX/TPU notes: farthest-point sampling runs as a lax.scan with static
iteration count; ball-query grouping is a static-k top-k over masked
distances (XLA-friendly fixed shapes; out-of-radius neighbors fall back to
the nearest point, the standard behavior). BatchNorm uses flax's BatchNorm
in inference-stats mode by default (use_running_average handled by caller
via mutable collections during training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.models.layers import torch_bias_init, torch_weight_init


def square_distance(a, b):
    """(B, N, 3), (B, M, 3) -> (B, N, M) squared distances."""
    return (
        jnp.sum(a**2, -1)[:, :, None]
        + jnp.sum(b**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("bnd,bmd->bnm", a, b)
    )


def farthest_point_sample(xyz, npoint: int):
    """(B, N, 3) -> (B, npoint) indices via iterative FPS (lax.scan)."""
    B, N, _ = xyz.shape

    def one(pts):
        def step(carry, _):
            dist, last = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            dist = jnp.minimum(dist, d)
            nxt = jnp.argmax(dist)
            return (dist, nxt), nxt

        init = (jnp.full((N,), jnp.inf), jnp.asarray(0, jnp.int32))
        _, idx = jax.lax.scan(step, init, None, length=npoint - 1)
        return jnp.concatenate([jnp.zeros(1, jnp.int32), idx.astype(jnp.int32)])

    return jax.vmap(one)(xyz)


def ball_query(radius: float, nsample: int, xyz, new_xyz):
    """(B, N, 3) x (B, S, 3) -> (B, S, nsample) neighbor indices.

    Fixed-size: the nsample nearest points within the radius; slots beyond
    the in-radius count repeat the nearest neighbor.
    """
    d2 = square_distance(new_xyz, xyz)  # (B, S, N)
    masked = jnp.where(d2 <= radius**2, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-masked, nsample)  # ascending distance
    nearest = idx[..., :1]
    valid = jnp.isfinite(-neg)
    return jnp.where(valid, idx, nearest)


class SharedMLP(nn.Module):
    """1x1-conv MLP with BatchNorm + ReLU per layer (torch Conv2d/1d k=1)."""

    channels: tuple

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            fan_in = x.shape[-1]
            w = self.param(f"conv{i}_kernel", torch_weight_init, (fan_in, c))
            b = self.param(f"conv{i}_bias", torch_bias_init(fan_in), (c,))
            x = x @ w + b
            x = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: tuple
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        """xyz (B, N, 3), points (B, N, D) -> (B, S, 3), (B, S, mlp[-1])."""
        if self.group_all:
            grouped = points[:, None]  # (B, 1, N, D)
            rel = xyz[:, None]  # (B, 1, N, 3)
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            feats = jnp.concatenate([rel, grouped], axis=-1)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
            group_idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = jax.vmap(lambda x, i: x[i])(xyz, group_idx)
            rel = grouped_xyz - new_xyz[:, :, None, :]
            grouped_pts = jax.vmap(lambda f, i: f[i])(points, group_idx)
            feats = jnp.concatenate([rel, grouped_pts], axis=-1)  # (B,S,k,3+D)
        feats = SharedMLP(self.mlp, name="mlp")(feats, train)
        return new_xyz, feats.max(axis=2)


class FeaturePropagation(nn.Module):
    mlp: tuple

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False):
        """Interpolate coarse features (xyz2, points2) back onto xyz1."""
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interpolated = jnp.broadcast_to(points2, (B, N, points2.shape[-1]))
        else:
            d2 = square_distance(xyz1, xyz2)
            neg, idx = jax.lax.top_k(-d2, 3)
            w = 1.0 / (-neg + 1e-8)
            w = w / w.sum(axis=-1, keepdims=True)
            gathered = jax.vmap(lambda f, i: f[i])(points2, idx)  # (B,N,3,D)
            interpolated = (gathered * w[..., None]).sum(axis=2)
        if points1 is not None:
            interpolated = jnp.concatenate([points1, interpolated], axis=-1)
        return SharedMLP(self.mlp, name="mlp")(interpolated, train)


class PointNetPlusPlus(nn.Module):
    """Standard 3-level SA/FP stack producing c_dim per-point features."""

    c_dim: int = 32

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        """(B, N, 3) -> (xyz, per-point features (B, N, c_dim))."""
        l0_points = xyz
        l1_xyz, l1_points = SetAbstraction(512, 0.2, 32, (64, 64, 128), name="sa1")(
            xyz, l0_points, train
        )
        l2_xyz, l2_points = SetAbstraction(128, 0.4, 64, (128, 128, 256), name="sa2")(
            l1_xyz, l1_points, train
        )
        l3_xyz, l3_points = SetAbstraction(None, None, None, (256, 512, 1024),
                                           group_all=True, name="sa3")(l2_xyz, l2_points, train)

        l2_points = FeaturePropagation((256, 256), name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train
        )
        l1_points = FeaturePropagation((256, 128), name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train
        )
        l0_points = FeaturePropagation((128, 128, self.c_dim), name="fp1")(
            xyz, l1_xyz, None, l1_points, train
        )
        return xyz, l0_points

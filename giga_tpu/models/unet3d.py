"""Configurable 3D U-Net for the 'grid' feature branch
(reference: ConvONets/encoder/unet3d.py — available to GIGA configs with
plane_type=['grid'], not used by the shipped presets).

Standard encoder/decoder with DoubleConv(GroupNorm + ReLU) blocks, max-pool
downsampling and trilinear-style (nearest x2) upsampling with concat merges.
Channels-last (B, D, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.models.layers import TorchConv


class DoubleConv3D(nn.Module):
    features: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):
        for i in (1, 2):
            x = TorchConv(self.features, 3, name=f"conv{i}")(x)
            groups = min(self.num_groups, self.features)
            x = nn.GroupNorm(num_groups=groups, name=f"gn{i}")(x)
            x = jax.nn.relu(x)
        return x


def _upsample2_3d(x):
    for axis in (1, 2, 3):
        x = jnp.repeat(x, 2, axis=axis)
    return x


class UNet3D(nn.Module):
    out_channels: int
    f_maps: int = 32
    num_levels: int = 3

    @nn.compact
    def __call__(self, x):
        skips = []
        for lvl in range(self.num_levels):
            x = DoubleConv3D(self.f_maps * (2**lvl), name=f"enc{lvl}")(x)
            if lvl < self.num_levels - 1:
                skips.append(x)
                x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        for lvl in range(self.num_levels - 2, -1, -1):
            x = _upsample2_3d(x)
            x = jnp.concatenate([x, skips[lvl]], axis=-1)
            x = DoubleConv3D(self.f_maps * (2**lvl), name=f"dec{lvl}")(x)
        return TorchConv(self.out_channels, 1, name="final")(x)

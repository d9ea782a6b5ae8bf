"""3D U-Net for the 'grid' feature branch, matching the reference
architecture exactly (ConvONets/encoder/unet3d.py:361-500, the pytorch-3dunet
`UNet3D` with `DoubleConv` blocks and default layer order 'gcr').

Structure (per reference defaults used via voxels.py:44-46 / pointnet.py):
- SingleConv = GroupNorm(8, eps 1e-5) -> Conv3d(k3, p1, no bias) -> ReLU
  ('gcr'; conv bias disabled because groupnorm is present,
  unet3d.py:50-52).
- DoubleConv encoder: conv1 out = max(out // 2, in); decoder: in -> out -> out
  (unet3d.py:125-144).
- Encoder levels: MaxPool3d(2) before every level except the first
  (unet3d.py:403-413).
- Decoder levels: nearest-neighbor upsample to the skip's spatial size,
  concat [skip, x] on channels, DoubleConv with in = f[i] + f[i+1]
  (unet3d.py:418-431, 259-293).
- Final 1x1 Conv3d with bias; no final activation in the forward used for
  features (testing=False semantics, unet3d.py:437-476).

Channels-last (B, D, H, W, C); spatial order matches torch's (D, H, W).
All ops (conv / groupnorm / maxpool / gather-upsample) fuse under XLA; the
max-pool here is forward-dominant (encoder features), so the TPU
SelectAndScatter backward cost noted for 2D does not bite at 3D sizes used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.models.layers import TorchConv


def feature_maps(f_maps: int, num_levels: int):
    return [f_maps * 2**k for k in range(num_levels)]


class SingleConvGCR(nn.Module):
    """groupnorm -> conv3d(no bias) -> relu (reference order 'gcr')."""

    features: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        groups = self.num_groups if in_ch >= self.num_groups else 1
        x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="groupnorm")(x)
        x = TorchConv(self.features, 3, use_bias=False, name="conv")(x)
        return jax.nn.relu(x)


class DoubleConv3D(nn.Module):
    features: int
    encoder: bool
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):
        if self.encoder:
            conv1_out = max(self.features // 2, x.shape[-1])
        else:
            conv1_out = self.features
        x = SingleConvGCR(conv1_out, self.num_groups, name="SingleConv1")(x)
        x = SingleConvGCR(self.features, self.num_groups, name="SingleConv2")(x)
        return x


def _nearest_resize(x, sizes):
    """F.interpolate(mode='nearest', size=sizes) over the 3 spatial axes."""
    for axis, out in zip((1, 2, 3), sizes):
        n = x.shape[axis]
        if n == out:
            continue
        idx = jnp.floor(jnp.arange(out) * (n / out)).astype(jnp.int32)
        x = jnp.take(x, idx, axis=axis)
    return x


class UNet3D(nn.Module):
    """Reference-parity 3D U-Net. Input (B, D, H, W, C) -> (B, D, H, W, out)."""

    out_channels: int
    f_maps: int = 32
    num_levels: int = 3
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):
        fmaps = feature_maps(self.f_maps, self.num_levels)
        skips = []
        for i, f in enumerate(fmaps):
            if i > 0:
                x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
            x = DoubleConv3D(f, encoder=True, num_groups=self.num_groups,
                             name=f"encoders_{i}")(x)
            skips.append(x)
        skips = skips[:-1]
        for i, skip in enumerate(reversed(skips)):
            x = _nearest_resize(x, skip.shape[1:4])
            x = jnp.concatenate([skip, x], axis=-1)  # torch cat((skip, x), 1)
            x = DoubleConv3D(skip.shape[-1], encoder=False,
                             num_groups=self.num_groups, name=f"decoders_{i}")(x)
        return TorchConv(self.out_channels, 1, name="final_conv")(x)

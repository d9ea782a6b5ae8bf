"""2D U-Net over feature planes (reference: ConvONets/encoder/unet.py:48-239).

GIGA preset: depth 3, start_filts 32, concat merges, transpose-conv
upsampling, xavier-normal conv init (zero bias). One U-Net is shared across
the three feature planes (the reference instantiates a single ``self.unet``
in LocalVoxelEncoder, voxels.py:39); here the three planes are processed as a
batch of 3B so every conv sees one large MXU-friendly batch.

Channels-last (B, H, W, C) throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from giga_tpu.core.config import UNet2DConfig
from giga_tpu.models.layers import ConvTranspose2x2, TorchConv


def max_pool_2x2(x):
    """2x2 stride-2 max pool as reshape+max.

    Equivalent to nn.max_pool(window 2, stride 2) but its gradient lowers to
    cheap elementwise selects instead of TPU's slow SelectAndScatter (the
    reduce_window backward), which dominated the U-Net backward pass.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.max(axis=(2, 4))


class DownConv(nn.Module):
    """Two 3x3 convs (+ReLU) with an optional 2x2 max-pool."""

    features: int
    pooling: bool = True

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(TorchConv(self.features, 3, xavier=True, name="conv1")(x))
        x = jax.nn.relu(TorchConv(self.features, 3, xavier=True, name="conv2")(x))
        before_pool = x
        if self.pooling:
            x = max_pool_2x2(x)
        return x, before_pool


class UpConv(nn.Module):
    """2x2 transpose-conv upsample, skip merge, then two 3x3 convs (+ReLU)."""

    features: int
    merge_mode: str = "concat"

    @nn.compact
    def __call__(self, from_down, from_up):
        from_up = ConvTranspose2x2(self.features, name="upconv")(from_up)
        if self.merge_mode == "concat":
            x = jax.numpy.concatenate([from_up, from_down], axis=-1)
        else:
            x = from_up + from_down
        x = jax.nn.relu(TorchConv(self.features, 3, xavier=True, name="conv1")(x))
        x = jax.nn.relu(TorchConv(self.features, 3, xavier=True, name="conv2")(x))
        return x


class UNet2D(nn.Module):
    """Configurable U-Net; spatial dims must be divisible by 2**(depth-1)."""

    num_classes: int
    cfg: UNet2DConfig = UNet2DConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        encoder_outs = []
        for i in range(cfg.depth):
            features = cfg.start_filts * (2**i)
            pooling = i < cfg.depth - 1
            x, before_pool = DownConv(features, pooling, name=f"down{i}")(x)
            encoder_outs.append(before_pool)
        for i in range(cfg.depth - 1):
            features = cfg.start_filts * (2 ** (cfg.depth - 2 - i))
            x = UpConv(features, cfg.merge_mode, name=f"up{i}")(encoder_outs[-(i + 2)], x)
        x = TorchConv(self.num_classes, 1, xavier=True, name="conv_final")(x)
        return x

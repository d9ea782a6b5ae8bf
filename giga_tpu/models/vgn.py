"""Dense VGN baseline network (reference: src/vgn/networks.py:48-63, 172-212).

3D conv-deconv over the 40^3 TSDF with three dense prediction heads:
    encoder: 3 x stride-2 convs (16/32/64 channels, kernels 5/3/3), 40->5
    decoder: 3 convs with nearest x2 upsampling back to 40^3
    heads:   k5 convs -> qual (sigmoid), rot (channel-normalized 4), width

Channels-last (B, D, H, W, C). ``F.interpolate(x, n)`` with the default
nearest mode at exact x2 factors is an element repeat.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.core.config import VGNConfig
from giga_tpu.models.conv_onet import normalize_quat
from giga_tpu.models.layers import TorchConv


def _upsample2(x):
    """Nearest-neighbor x2 upsampling on the three spatial dims."""
    for axis in (1, 2, 3):
        x = jnp.repeat(x, 2, axis=axis)
    return x


class VGNNet(nn.Module):
    cfg: VGNConfig = VGNConfig()

    @nn.compact
    def __call__(self, tsdf):
        """(B, 40, 40, 40) -> qual (B,40,40,40), rot (B,40,40,40,4), width (B,40,40,40)."""
        cfg = self.cfg
        x = tsdf[..., None]
        for i, (f, k) in enumerate(zip(cfg.encoder_filters, cfg.encoder_kernels)):
            x = jax.nn.relu(TorchConv(f, k, strides=2, name=f"enc_conv{i + 1}")(x))
        for i, (f, k) in enumerate(zip(cfg.decoder_filters, cfg.decoder_kernels)):
            x = jax.nn.relu(TorchConv(f, k, name=f"dec_conv{i + 1}")(x))
            x = _upsample2(x)
        qual = jax.nn.sigmoid(TorchConv(1, 5, name="conv_qual")(x)[..., 0])
        rot = normalize_quat(TorchConv(4, 5, name="conv_rot")(x))
        width = TorchConv(1, 5, name="conv_width")(x)[..., 0]
        return qual, rot, width

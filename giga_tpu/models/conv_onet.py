"""GIGA model assembly (reference: ConvONets/conv_onet/models/__init__.py:15-226
and conv_onet/config.py:15-91).

The model = triplane encoder + stacked affordance decoder (qual/rot/width)
+ optional occupancy decoder. Heads:
    qual  -> sigmoid         (grasp success probability)
    rot   -> L2-normalized 4-vector (quaternion, xyzw)
    width -> raw             (normalized gripper width)
    occ   -> raw logits      (occupancy; sigmoid applied by losses/planners)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.core.config import GIGAConfig
from giga_tpu.models.decoder import StackedLocalDecoder, query_planes
from giga_tpu.models.encoder import TriplaneVoxelEncoder


def normalize_quat(q, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(q, axis=axis, keepdims=True)
    return q / jnp.maximum(norm, eps)


class GIGANet(nn.Module):
    """Convolutional occupancy network with grasp-affordance heads.

    __call__(tsdf, p, p_tsdf) mirrors the reference forward
    (conv_onet/models/__init__.py:42-67): encode once, decode affordance at
    p, optionally decode occupancy at p_tsdf.
    """

    cfg: GIGAConfig

    def setup(self):
        self.encoder = TriplaneVoxelEncoder(self.cfg.encoder)
        if self.cfg.has_affordance:
            self.decoder_aff = StackedLocalDecoder(self.cfg.decoder, heads=3, out_dim=4)
        if self.cfg.decoder_tsdf:
            self.decoder_occ = StackedLocalDecoder(self.cfg.decoder, heads=1, out_dim=1)

    def encode(self, tsdf):
        """(B, R, R, R) -> plane dict {t: (B, H, W, C)}."""
        return self.encoder(tsdf)

    def decode_affordance(self, planes, p, feature=None):
        """(B, N, 3) -> qual (B, N), rot (B, N, 4), width (B, N)."""
        out = self.decoder_aff(planes, p, feature=feature)
        qual = jax.nn.sigmoid(out[0, ..., 0])
        rot = normalize_quat(out[1])
        width = out[2, ..., 0]
        return qual, rot, width

    def decode_occupancy(self, planes, p, feature=None):
        """(B, N, 3) -> occupancy logits (B, N)."""
        if self.cfg.detach_tsdf:
            planes = jax.tree_util.tree_map(jax.lax.stop_gradient, planes)
            if feature is not None:
                feature = jax.lax.stop_gradient(feature)
        return self.decoder_occ(planes, p, feature=feature)[0, ..., 0]

    def __call__(self, tsdf, p, p_tsdf: Optional[jnp.ndarray] = None):
        planes = self.encode(tsdf)
        outputs = {}
        if self.cfg.has_affordance and p is not None:
            qual, rot, width = self.decode_affordance(planes, p)
            outputs.update(qual=qual, rot=rot, width=width)
        if self.cfg.decoder_tsdf and p_tsdf is not None:
            outputs["occ"] = self.decode_occupancy(planes, p_tsdf)
        return outputs

    def query_feature(self, planes, p):
        """Sampled + concatenated plane features at p (for feature reuse)."""
        return query_planes(planes, p, self.cfg.decoder)

    def grad_refine(self, tsdf, pos, bound_value: float = 0.0125,
                    lr: float = 1e-6, num_step: int = 1):
        """Gradient-ascent refinement of query positions on grasp quality
        (reference: conv_onet/models/__init__.py:136-164). Returns
        (qual, refined_pos, rot, width) after clamping to +-bound_value."""
        planes = self.encode(tsdf)

        def neg_qual_sum(p):
            qual, _, _ = self.decode_affordance(planes, p)
            return -qual.sum()

        p = pos
        for _ in range(num_step):
            g = jax.grad(neg_qual_sum)(p)
            p = p - lr * g
        p = jnp.clip(p, pos - bound_value, pos + bound_value)
        qual, rot, width = self.decode_affordance(planes, p)
        return qual, p, rot, width

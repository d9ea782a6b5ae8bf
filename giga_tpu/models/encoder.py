"""Triplane voxel encoder (reference: ConvONets/encoder/voxels.py:10-121).

Pipeline: (B, R, R, R) TSDF -> Conv3d(1->c_dim, k3) + ReLU -> per-voxel
features -> pool onto three R_p^2 planes -> shared 2D U-Net refines all three
planes as one batch.

TPU-first insight (SURVEY.md section 7.1): with padding=0 and input
resolution == plane resolution, the reference's normalize->index->scatter_mean
chain (common.py:238-318 + torch_scatter) maps voxel (i, j, k) to plane cell
(i, k) / (i, j) / (j, k) exactly — i.e. plane features are a plain mean over
the orthogonal axis. That turns a general scatter into a static reduction
XLA fuses into the surrounding ops. A general segment-mean path is kept for
mismatched resolutions (and is the basis of the point-cloud encoders).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.core.config import EncoderConfig
from giga_tpu.models.layers import ZBandedConvStem
from giga_tpu.models.unet2d import UNet2D
from giga_tpu.models.unet3d import UNet3D
from giga_tpu.ops.scatter import scatter_mean_grid, scatter_mean_planes


def voxel_lattice_points(shape, dtype=jnp.float32):
    """Per-voxel (x, y, z) coords, linspace(-0.5, 0.5, n) per axis (voxels.py:95-103)."""
    axes = [jnp.linspace(-0.5, 0.5, n, dtype=dtype) for n in shape]
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grids, axis=-1)


def axis_mean_planes(feat, plane_types):
    """Exact static-lattice pooling: mean over the dropped voxel axis, spatial
    axes swapped to the reference's (row=second, col=first) plane layout.
    Shared by the encoder's lattice_exact path and the stage profiler."""
    reductions = {"xz": 2, "xy": 3, "yz": 1}
    return {
        t: feat.mean(axis=reductions[t]).transpose(0, 2, 1, 3)
        for t in plane_types
    }


class TriplaneVoxelEncoder(nn.Module):
    """LocalVoxelEncoder equivalent. Input (B, R, R, R); output plane dict.

    Returns {plane_type: (B, H, W, C)} with the reference's plane layout:
    row = second plane axis, col = first plane axis.
    """

    cfg: EncoderConfig = EncoderConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        B = x.shape[0]
        in_res = x.shape[1:4]
        x = x[..., None]  # NDHWC
        # param-compatible with TorchConv; on TPU the z axis folds into
        # channels so the Cin=1 stem fills the MXU's contraction depth
        feat = jax.nn.relu(
            ZBandedConvStem(cfg.c_dim, cfg.kernel_size, name="conv_in")(x)
        )
        # feat: (B, X, Y, Z, C)

        if "grid" in cfg.plane_types:
            # grid branch replaces the planes entirely (voxels.py:111-113)
            return {"grid": self._grid_features(feat, in_res)}

        lattice_exact = (
            cfg.padding == 0.0
            and in_res == (cfg.plane_resolution,) * 3
        )
        if lattice_exact:
            planes = axis_mean_planes(feat, cfg.plane_types)
        else:
            planes = {}
            pts = voxel_lattice_points(in_res)
            pts = jnp.broadcast_to(pts[None], (B,) + pts.shape)
            flat_feat = feat.reshape(B, -1, cfg.c_dim)
            flat_pts = pts.reshape(B, -1, 3)
            for t in cfg.plane_types:
                planes[t] = scatter_mean_planes(
                    flat_pts, flat_feat, t, cfg.plane_resolution, cfg.padding
                )

        # one shared U-Net over all planes, batched as (3B, H, W, C)
        order = [t for t in ("xz", "xy", "yz") if t in planes]
        stacked = jnp.concatenate([planes[t] for t in order], axis=0)
        refined = UNet2D(cfg.c_dim, cfg.unet, name="unet")(stacked)
        chunks = jnp.split(refined, len(order), axis=0)
        return {t: c for t, c in zip(order, chunks)}

    def _grid_features(self, feat, in_res):
        """(B, X, Y, Z, C) voxel features -> refined (B, Z, Y, X, C) grid
        (reference generate_grid_features, voxels.py:74-86).

        With padding=0 and grid_resolution == input resolution, the
        normalize->index->scatter chain maps voxel (x, y, z) to cell
        (z, y, x) one-to-one — a transpose, not a scatter (same static-
        lattice insight as the plane path)."""
        cfg = self.cfg
        if cfg.padding == 0.0 and in_res == (cfg.grid_resolution,) * 3:
            grid = feat.transpose(0, 3, 2, 1, 4)
        else:
            B = feat.shape[0]
            pts = voxel_lattice_points(in_res)
            pts = jnp.broadcast_to(pts[None], (B,) + pts.shape).reshape(B, -1, 3)
            grid = scatter_mean_grid(
                pts, feat.reshape(B, -1, cfg.c_dim), cfg.grid_resolution, cfg.padding
            )
        return UNet3D(cfg.c_dim, cfg.unet3d.f_maps, cfg.unet3d.num_levels,
                      cfg.unet3d.num_groups, name="unet3d")(grid)


class GlobalVoxelEncoder(nn.Module):
    """Global-latent voxel encoder (reference: ConvONets/encoder/voxels.py:123-156).

    A strided Conv3d pyramid (1->32->64->128->256->512, k3 s2 p1) collapsing
    the volume to a 2^3 feature block, then FC to a single ``c_dim`` latent
    code per scene — the ConvONet *global* conditioning variant, in contrast
    to the local triplane/grid encoders above. Unused by the four shipped
    GIGA presets but part of the reference's encoder zoo. Channels-last
    (B, X, Y, Z, C) layout; explicit (1, 1) padding reproduces torch's
    Conv3d(padding=1, stride=2) output geometry exactly.
    """

    c_dim: int = 128

    @nn.compact
    def __call__(self, x):
        if x.ndim == 5:  # tolerate a leading (B, 1, R, R, R) channel axis
            x = x[:, 0]
        h = x[..., None]
        pad = [(1, 1)] * 3
        h = nn.Conv(32, (3, 3, 3), padding=pad, name="conv_in")(h)
        for i, ch in enumerate((64, 128, 256, 512)):
            h = nn.Conv(ch, (3, 3, 3), strides=(2, 2, 2), padding=pad,
                        name=f"conv_{i}")(nn.relu(h))
        h = nn.relu(h).reshape(x.shape[0], -1)
        return nn.Dense(self.c_dim, name="fc")(h)

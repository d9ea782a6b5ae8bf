"""Point-cloud encoders (reference: ConvONets/encoder/pointnet.py:11-157).

LocalPoolPointnet: per-point ResNet-FC blocks interleaved with local pooling
— points scatter (max or mean) into their plane/grid cells and gather the
pooled value back, so each point sees its cell's aggregate. The final point
features scatter-mean onto feature planes refined by the shared 2D U-Net
(same plane layout as the voxel encoder).

TPU notes: pooling uses segment_max/segment_sum with static cell counts;
gather-back is a plain take. Shapes are static in the point count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.core.config import EncoderConfig
from giga_tpu.models.layers import ResnetBlockFC, TorchDense
from giga_tpu.models.unet2d import UNet2D
from giga_tpu.models.unet3d import UNet3D
from giga_tpu.ops.scatter import grid_index, plane_index, scatter_mean_grid, scatter_mean_planes, segment_max, segment_mean


class PatchLocalPoolPointnet(nn.Module):
    """Crop-variant point encoder (reference: pointnet.py:159-290).

    Same per-point ResNet + local-pooling architecture as LocalPoolPointnet
    but with externally precomputed plane-cell indices (crop-normalized) and
    points mapped to per-voxel local coordinates with optional sin/cos
    positional encoding — the encoder side of the sliding-window pipeline.

    __call__(points (B, T, 3), index {t: (B, T) int cell ids}).
    """

    cfg: EncoderConfig = EncoderConfig()
    hidden_dim: int = 32
    n_blocks: int = 5
    scatter_type: str = "max"
    local_coord: bool = True
    unit_size: float = 0.1
    pos_encoding: str = "linear"

    @nn.compact
    def __call__(self, p, index: dict):
        from giga_tpu.ops.sampling import map2local

        cfg = self.cfg
        h = self.hidden_dim
        reso = cfg.plane_resolution

        def pool_local(feat):
            out = 0
            for key, idx in index.items():
                n_cells = (
                    cfg.grid_resolution**3 if key == "grid" else reso * reso
                )

                def one(f, i):
                    if self.scatter_type == "max":
                        cells = segment_max(f, i, n_cells)
                    else:
                        cells = segment_mean(f, i, n_cells)
                    return cells[i]

                out = out + jax.vmap(one)(feat, idx)
            return out

        pin = map2local(p, self.unit_size, self.pos_encoding) if self.local_coord else p
        net = TorchDense(2 * h, name="fc_pos")(pin)
        net = ResnetBlockFC(size_out=h, name="block0")(net)
        for i in range(1, self.n_blocks):
            pooled = pool_local(net)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(size_out=h, name=f"block{i}")(net)
        c = TorchDense(cfg.c_dim, name="fc_c")(net)

        fea = {}
        if "grid" in index:
            # reference generate_grid_features (pointnet.py:250-263): mean
            # scatter to the reso_grid^3 lattice ([z, y, x, c] layout) + 3D
            # U-Net refinement
            greso = cfg.grid_resolution

            def one_grid(ci, ii):
                return segment_mean(ci, ii, greso**3).reshape(
                    greso, greso, greso, -1
                )

            grid = jax.vmap(one_grid)(c, index["grid"])
            fea["grid"] = UNet3D(cfg.c_dim, cfg.unet3d.f_maps,
                                 cfg.unet3d.num_levels, cfg.unet3d.num_groups,
                                 name="unet3d")(grid)

        order = [t for t in ("xz", "xy", "yz") if t in index]
        if order:
            planes = []
            for t in order:
                def one(ci, ii):
                    return segment_mean(ci, ii, reso * reso).reshape(reso, reso, -1)

                planes.append(jax.vmap(one)(c, index[t]))
            stacked = jnp.concatenate(planes, axis=0)
            refined = UNet2D(cfg.c_dim, cfg.unet, name="unet")(stacked)
            for t, ch in zip(order, jnp.split(refined, len(order), axis=0)):
                fea[t] = ch
        return fea


class LocalPoolPointnet(nn.Module):
    """Points (B, T, 3) -> plane dict {t: (B, H, W, C)} (+ optional 'grid')."""

    cfg: EncoderConfig = EncoderConfig()
    hidden_dim: int = 32
    n_blocks: int = 5
    scatter_type: str = "max"  # 'max' | 'mean'
    grid_resolution: int | None = None
    use_grid: bool = False

    @nn.compact
    def __call__(self, p):
        cfg = self.cfg
        h = self.hidden_dim
        reso = cfg.plane_resolution

        indices = {
            t: plane_index(p, t, reso, cfg.padding) for t in cfg.plane_types
        }
        if self.use_grid:
            indices["grid"] = grid_index(p, self.grid_resolution, cfg.padding)

        def pool_local(feat):
            """Scatter-pool each point's feature into its cells, gather back."""
            out = 0
            for key, idx in indices.items():
                n_cells = (
                    self.grid_resolution**3 if key == "grid" else reso * reso
                )

                def one(f, i):
                    if self.scatter_type == "max":
                        cells = segment_max(f, i, n_cells)
                    else:
                        cells = segment_mean(f, i, n_cells)
                    return cells[i]

                out = out + jax.vmap(one)(feat, idx)
            return out

        net = TorchDense(2 * h, name="fc_pos")(p)
        net = ResnetBlockFC(size_out=h, name="block0")(net)
        for i in range(1, self.n_blocks):
            pooled = pool_local(net)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(size_out=h, name=f"block{i}")(net)
        c = TorchDense(cfg.c_dim, name="fc_c")(net)

        fea = {}
        order = [t for t in ("xz", "xy", "yz") if t in cfg.plane_types]
        if order:
            planes = {
                t: scatter_mean_planes(p, c, t, reso, cfg.padding) for t in order
            }
            stacked = jnp.concatenate([planes[t] for t in order], axis=0)
            refined = UNet2D(cfg.c_dim, cfg.unet, name="unet")(stacked)
            chunks = jnp.split(refined, len(order), axis=0)
            fea = {t: ch for t, ch in zip(order, chunks)}
        if self.use_grid:
            from giga_tpu.models.unet3d import UNet3D

            g = scatter_mean_grid(p, c, self.grid_resolution, cfg.padding)
            fea["grid"] = UNet3D(cfg.c_dim, cfg.unet3d.f_maps, cfg.unet3d.num_levels,
                                 cfg.unet3d.num_groups, name="unet3d")(g)
        return fea

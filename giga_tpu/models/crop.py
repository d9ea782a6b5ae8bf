"""Learned crop model for the sliding-window pipeline.

Wires ``PatchLocalPoolPointnet`` (models/pointnet.py) to ``PatchLocalDecoder``
(models/decoder.py) with the crop-coordinate protocol of the reference's
'pointcloud_crop' mode (ConvONets generation.py:150-297 + common.py:281-301):
points and queries are normalized to [0, 1] within an explicit input-crop
volume, plane-cell indices are computed from those normalized coordinates,
and positions enter the networks through per-voxel local coordinates — so one
trained model evaluates any crop of an arbitrarily large scene, and
``CropGenerator`` assembles whole-scene meshes through
``geometry/sliding_window.py``.

Memory is bounded by one crop regardless of scene size; crops share one
compiled program (fixed point/query counts) and are an embarrassingly
parallel batch axis across devices.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.core.config import DecoderConfig, EncoderConfig
from giga_tpu.models.decoder import PatchLocalDecoder
from giga_tpu.models.pointnet import PatchLocalPoolPointnet
from giga_tpu.ops.sampling import normalize_coord

PLANE_TYPES = ("xz", "xy", "yz")


def crop_plane_indices(points, input_vol, reso: int):
    """Per-plane flat cell ids for points inside an input crop.

    Matches the decoder's plane layout: ``plane[row, col]`` with
    col = first plane axis, row = second (flat id = i1 * reso + i0), and the
    reference's coordinate2index on crop-normalized coords
    (common.py:303-318 over normalize_coord).

    Args:
        points: (..., T, 3); input_vol: (lo, hi) arrays of shape (3,).
    Returns:
        {plane_type: (..., T) int32}
    """
    out = {}
    for t in PLANE_TYPES:
        u = normalize_coord(points, input_vol, t)  # (..., T, 2) in [0, 1]
        cell = jnp.clip((u * reso).astype(jnp.int32), 0, reso - 1)
        out[t] = cell[..., 1] * reso + cell[..., 0]
    return out


def crop_grid_indices(points, input_vol, reso: int):
    """Flat 3D cell ids for the crop encoder's 'grid' branch: the grid is
    laid out [z, y, x, c] (matching scatter_mean_grid / sample_grid), so
    flat id = iz * reso^2 + iy * reso + ix on crop-normalized coords."""
    u = normalize_coord(points, input_vol, "grid")  # (..., T, 3) in [0, 1]
    cell = jnp.clip((u * reso).astype(jnp.int32), 0, reso - 1)
    return cell[..., 2] * reso * reso + cell[..., 1] * reso + cell[..., 0]


def crop_query_coords(query, input_vol, plane_types=PLANE_TYPES):
    """Crop-normalized per-plane query coords for PatchLocalDecoder.

    Returns {plane_type: (..., N, 2)} in [0, 1] ((..., N, 3) for 'grid').
    """
    return {t: normalize_coord(query, input_vol, t) for t in plane_types}


class CropOccupancyNet(nn.Module):
    """PatchLocalPoolPointnet encoder + PatchLocalDecoder occupancy head.

    ``__call__(points, index, query, q_n)`` -> (..., N) occupancy logits.
    ``points``/``query`` are raw world coordinates (the networks only see
    them through ``map2local`` voxel-local coords, so the model is
    translation-equivariant across crops); ``index``/``q_n`` carry the
    crop-relative geometry from ``crop_plane_indices``/``crop_query_coords``.
    """

    cfg: EncoderConfig = EncoderConfig()
    dec_cfg: DecoderConfig | None = None
    hidden_dim: int = 32
    n_blocks: int = 5
    unit_size: float = 0.02
    pos_encoding: str = "linear"

    def setup(self):
        dec_cfg = self.dec_cfg or DecoderConfig(
            c_dim=self.cfg.c_dim, concat_feat=False, n_blocks=self.n_blocks
        )
        self.encoder = PatchLocalPoolPointnet(
            self.cfg, hidden_dim=self.hidden_dim, n_blocks=self.n_blocks,
            unit_size=self.unit_size, pos_encoding=self.pos_encoding,
        )
        self.decoder = PatchLocalDecoder(
            dec_cfg, out_dim=1, unit_size=self.unit_size,
            pos_encoding=self.pos_encoding,
        )

    def encode(self, points, index):
        """(B, T, 3) + {t: (B, T)} -> plane dict {t: (B, R, R, C)}."""
        return self.encoder(points, index)

    def decode(self, planes, query, q_n):
        """plane dict + (B, N, 3) + {t: (B, N, 2)} -> (B, N) logits."""
        return self.decoder(query, q_n, planes)

    def __call__(self, points, index, query, q_n):
        return self.decode(self.encode(points, index), query, q_n)


class CropGenerator:
    """Whole-scene mesh generation from a trained crop model.

    Jit-friendly adapter around ``SlidingWindowGenerator``: crop point clouds
    are resampled (with replacement) to a fixed count so every crop hits one
    compiled executable, and query lattices have a fixed per-crop size.
    """

    def __init__(self, net: CropOccupancyNet, params, n_crop_points: int = 2048,
                 resolution: int = 32, threshold: float = 0.5,
                 rng: np.random.RandomState | None = None):
        self.net = net
        self.params = jax.device_put(params)
        self.n_crop_points = n_crop_points
        self.resolution = resolution
        self.threshold = threshold
        self.rng = rng if rng is not None else np.random.RandomState(0)
        reso = net.cfg.plane_resolution
        # feature types the encoder will emit: 2D planes, plus the 3D 'grid'
        # branch when configured (reference generation.py:260-297 wires both)
        plane_types = tuple(t for t in PLANE_TYPES if t in net.cfg.plane_types)
        query_types = plane_types + (
            ("grid",) if "grid" in net.cfg.plane_types else ()
        )

        def encode(params, points, lo, hi):
            index = crop_plane_indices(points, (lo, hi), reso)
            index = {t: index[t] for t in plane_types}
            if "grid" in net.cfg.plane_types:
                index["grid"] = crop_grid_indices(
                    points, (lo, hi), net.cfg.grid_resolution
                )
            return net.apply(params, points, index, method="encode")

        def decode(params, planes, q, lo, hi):
            q_n = crop_query_coords(q, (lo, hi), plane_types=query_types)
            return net.apply(params, planes, q, q_n, method="decode")

        self._encode = jax.jit(encode)
        self._decode = jax.jit(decode)

    def _encode_crop(self, points: np.ndarray, vol):
        lo, hi = (np.asarray(v, np.float32) for v in vol)
        idx = self.rng.randint(0, len(points), self.n_crop_points)
        p = points[idx].astype(np.float32)[None]
        return self._encode(self.params, jnp.asarray(p), lo, hi)

    def _eval_crop(self, planes, q: np.ndarray, vol):
        lo, hi = (np.asarray(v, np.float32) for v in vol)
        logits = self._decode(
            self.params, planes, jnp.asarray(q[None], jnp.float32), lo, hi
        )
        return np.asarray(logits[0])

    def generate_mesh(self, points: np.ndarray, query_crop_size: float,
                      input_crop_size: float):
        """(P, 3) scene point cloud -> TriMesh in world coordinates."""
        from giga_tpu.geometry.sliding_window import SlidingWindowGenerator

        gen = SlidingWindowGenerator(
            self._encode_crop, self._eval_crop, resolution=self.resolution,
            threshold=self.threshold,
        )
        return gen.generate_mesh(points, query_crop_size, input_crop_size)

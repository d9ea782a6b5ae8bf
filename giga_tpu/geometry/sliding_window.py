"""Sliding-window mesh generation for scenes larger than the training
workspace (reference: conv_onet/generation.py:150-258 'pointcloud_crop').

The scene is tiled into query crops (with larger, overlapping input crops for
encoder context). Each crop is encoded and decoded independently with
crop-normalized coordinates, the per-crop value grids are concatenated along
z / y / x, and one mesh is extracted from the assembled grid. This is the
framework's "scale" axis: memory is bounded by one crop regardless of scene
size, and crops are embarrassingly parallel across devices.
"""

from __future__ import annotations

import numpy as np

from giga_tpu.geometry.mesh import TriMesh
from giga_tpu.geometry.native import marching_tetrahedra


def compute_crop_bounds(points: np.ndarray, query_crop_size: float, input_crop_size: float,
                        margin: float = 0.01):
    """Tile the point cloud's bbox into crops (reference get_crop_bound).

    Returns dict with 'query_vol'/'input_vol' (n_crop, 2, 3) and
    'axis_n_crop' (3,) — crops enumerate x-major, then y, then z fastest.
    """
    lb = points.min(axis=0) - margin
    ub = points.max(axis=0) + margin
    axis_n = np.maximum(np.ceil((ub - lb) / query_crop_size).astype(int), 1)
    grids = [lb[d] + query_crop_size * np.arange(axis_n[d]) for d in range(3)]
    lo = np.stack(np.meshgrid(*grids, indexing="ij"), axis=-1).reshape(-1, 3)
    hi = lo + query_crop_size
    center = (lo + hi) / 2
    in_lo = center - input_crop_size / 2
    in_hi = center + input_crop_size / 2
    return {
        "query_vol": np.stack([lo, hi], axis=1),
        "input_vol": np.stack([in_lo, in_hi], axis=1),
        "axis_n_crop": axis_n,
        "n_crop": int(np.prod(axis_n)),
        "query_crop_size": query_crop_size,
        "input_crop_size": input_crop_size,
    }


class SlidingWindowGenerator:
    """Assembles a scene mesh from per-crop implicit evaluations.

    Args:
        encode_crop_fn: (points (M, 3), input_vol (2, 3)) -> crop latent.
            Receives the scene points inside the (padded) input crop.
        eval_crop_fn: (latent, query_points (N, 3), input_vol) -> (N,) logits.
        resolution: query lattice per crop edge.
        threshold: occupancy probability iso level.
    """

    def __init__(self, encode_crop_fn, eval_crop_fn, resolution: int = 32,
                 threshold: float = 0.5, min_crop_points: int = 1):
        self.encode_crop_fn = encode_crop_fn
        self.eval_crop_fn = eval_crop_fn
        self.resolution = resolution
        self.threshold = threshold
        self.min_crop_points = min_crop_points

    def generate_mesh(self, points: np.ndarray, query_crop_size: float,
                      input_crop_size: float):
        """points: (P, 3) scene point cloud -> TriMesh in world coordinates."""
        vb = compute_crop_bounds(points, query_crop_size, input_crop_size)
        r = self.resolution
        nxc, nyc, nzc = vb["axis_n_crop"]
        logit_th = float(np.log(self.threshold) - np.log(1.0 - self.threshold))

        value = np.full((nxc * r, nyc * r, nzc * r), -1e6, np.float64)
        for ci in range(vb["n_crop"]):
            in_lo, in_hi = vb["input_vol"][ci]
            q_lo, q_hi = vb["query_vol"][ci]
            mask = np.all((points >= in_lo) & (points <= in_hi), axis=1)
            crop_points = points[mask]
            # lattice of query points covering this crop (cell corners)
            lin = [np.linspace(q_lo[d], q_hi[d], r, endpoint=False) for d in range(3)]
            q = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
            if len(crop_points) >= self.min_crop_points:
                latent = self.encode_crop_fn(crop_points, (in_lo, in_hi))
                logits = np.asarray(
                    self.eval_crop_fn(latent, q.astype(np.float32), (in_lo, in_hi))
                ).reshape(r, r, r)
            else:
                logits = np.full((r, r, r), -1e6)
            # crop index -> grid offset (x-major, z fastest like the reference)
            iz = ci % nzc
            iy = (ci // nzc) % nyc
            ix = ci // (nzc * nyc)
            value[ix * r : (ix + 1) * r, iy * r : (iy + 1) * r, iz * r : (iz + 1) * r] = logits

        padded = np.pad(value, 1, mode="constant", constant_values=-1e6)
        verts, faces = marching_tetrahedra(padded, logit_th)
        verts = verts - 1.0
        # index -> world: cell size = query_crop_size / r, origin at scene lb
        lb = vb["query_vol"][0][0]
        verts = verts * (query_crop_size / r) + lb
        return TriMesh(verts, faces)

"""Occupancy-to-mesh generation (reference: ConvONets/conv_onet/generation.py
Generator3D, the GIGA-relevant paths: dense grid or refined evaluation ->
iso-surface extraction -> unit-cube vertex mapping).

The occupancy field is decoded on device in fixed-size query chunks; the
surface band is refined hierarchically (geometry/refine.py) and triangulated
by the native marching-tetrahedra kernel.
"""

from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from giga_tpu.geometry.mesh import TriMesh
from giga_tpu.geometry.native import marching_tetrahedra
from giga_tpu.geometry.refine import refine_grid


class MeshGenerator:
    """Generates scene meshes from a GIGA model's occupancy decoder.

    Args:
        net, params: a GIGANet (with occupancy head) + params.
        threshold: occupancy probability iso level (default 0.5 like the
            reference's log-odds transform at generation.py:110).
        resolution0 / upsampling_steps: base grid + refinement levels.
        points_batch_size: device query chunk (generation.py:42).
    """

    def __init__(self, net, params, threshold: float = 0.5, resolution0: int = 32,
                 upsampling_steps: int = 2, points_batch_size: int = 100000,
                 padding: float = 0.0):
        self.net = net
        self.params = params
        self.threshold = float(threshold)
        self.resolution0 = resolution0
        self.upsampling_steps = upsampling_steps
        self.points_batch_size = points_batch_size
        self.padding = padding
        self._planes = None

    def encode(self, tsdf_grid: np.ndarray):
        """(R, R, R) or (1, R, R, R) TSDF -> cached feature planes."""
        grid = np.squeeze(np.asarray(tsdf_grid, np.float32))
        planes = self.net.apply(self.params, jnp.asarray(grid)[None], method="encode")
        self._planes = planes
        return planes

    def eval_occ_logits(self, points: np.ndarray) -> np.ndarray:
        """(N, 3) points in [-0.5, 0.5] -> (N,) occupancy logits, chunked."""
        assert self._planes is not None, "call encode() first"
        outs = []
        for s in range(0, len(points), self.points_batch_size):
            chunk = jnp.asarray(points[s : s + self.points_batch_size], jnp.float32)
            logits = self.net.apply(
                self.params, self._planes, chunk[None], method="decode_occupancy"
            )
            outs.append(np.asarray(logits[0]))
        return np.concatenate(outs) if outs else np.zeros(0, np.float32)

    def generate_mesh(self, tsdf_grid: np.ndarray, return_stats: bool = True):
        """TSDF grid -> (mesh in [-0.5, 0.5]^3 coords[, stats dict])."""
        stats = {}
        t0 = time.time()
        self.encode(tsdf_grid)
        stats["time (encode inputs)"] = time.time() - t0

        logit_th = float(np.log(self.threshold) - np.log(1.0 - self.threshold))
        box_size = 1.0 + self.padding

        t0 = time.time()

        def eval_fn(frac_points):
            # fractions in [0, 1] -> box coords in [-box/2, box/2]
            p = box_size * (frac_points.astype(np.float32) - 0.5)
            return self.eval_occ_logits(p)

        value_grid = refine_grid(
            eval_fn, self.resolution0, self.upsampling_steps, logit_th
        )
        stats["time (eval points)"] = time.time() - t0

        mesh = self.extract_mesh(value_grid, logit_th, box_size, stats)
        if return_stats:
            return mesh, stats
        return mesh

    def extract_mesh(self, value_grid: np.ndarray, logit_th: float, box_size: float,
                     stats: dict) -> TriMesh:
        t0 = time.time()
        # pad with a very low value so the surface closes at the boundary
        padded = np.pad(value_grid, 1, mode="constant", constant_values=-1e6)
        verts, faces = marching_tetrahedra(padded, logit_th)
        stats["time (marching cubes)"] = time.time() - t0
        verts = verts - 1.0  # undo padding
        n = value_grid.shape[0]
        verts = verts / (n - 1)  # [0, 1]
        verts = box_size * (verts - 0.5)
        return TriMesh(verts, faces)

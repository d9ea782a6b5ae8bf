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
                 padding: float = 0.0, simplify_nfaces: int | None = None,
                 refinement_step: int = 0):
        self.net = net
        self.params = params
        self.threshold = float(threshold)
        self.resolution0 = resolution0
        self.upsampling_steps = upsampling_steps
        self.points_batch_size = points_batch_size
        self.padding = padding
        self.simplify_nfaces = simplify_nfaces
        self.refinement_step = refinement_step
        self._planes = None
        # jitted once: unjitted apply would dispatch op-by-op (very slow on
        # remote accelerators); chunk padding keeps shapes reusable
        import jax

        self._decode = jax.jit(
            lambda params, planes, pts: self.net.apply(
                params, planes, pts, method="decode_occupancy"
            )
        )
        self._encode = jax.jit(
            lambda params, grid: self.net.apply(params, grid, method="encode")
        )

    def encode(self, tsdf_grid: np.ndarray):
        """(R, R, R) or (1, R, R, R) TSDF -> cached feature planes."""
        grid = np.squeeze(np.asarray(tsdf_grid, np.float32))
        planes = self._encode(self.params, jnp.asarray(grid)[None])
        self._planes = planes
        return planes

    def eval_occ_logits(self, points: np.ndarray) -> np.ndarray:
        """(N, 3) points in [-0.5, 0.5] -> (N,) occupancy logits.

        Chunks are zero-padded to a fixed size so every call hits one
        compiled executable regardless of how many points each refinement
        level produces (dynamic shapes would recompile per level).
        """
        assert self._planes is not None, "call encode() first"
        n = len(points)
        if n == 0:
            return np.zeros(0, np.float32)
        cs = min(self.points_batch_size, max(16384, 1 << int(np.ceil(np.log2(n)))))
        outs = []
        for s in range(0, n, cs):
            chunk = points[s : s + cs]
            pad = cs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
            logits = self._decode(
                self.params, self._planes, jnp.asarray(chunk, jnp.float32)[None]
            )
            out = np.asarray(logits[0])
            outs.append(out[: cs - pad] if pad else out)
        return np.concatenate(outs)

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
        mesh = TriMesh(verts, faces)

        if self.simplify_nfaces is not None and len(mesh.faces) > self.simplify_nfaces:
            from giga_tpu.geometry.native import simplify_mesh

            t0 = time.time()
            v2, f2 = simplify_mesh(mesh, self.simplify_nfaces)
            mesh = TriMesh(v2, f2)
            stats["time (simplify)"] = time.time() - t0

        if self.refinement_step > 0 and len(mesh.vertices):
            t0 = time.time()
            mesh = self.refine_mesh(mesh, self.refinement_step)
            stats["time (refine)"] = time.time() - t0
        return mesh

    def estimate_normals(self, vertices: np.ndarray) -> np.ndarray:
        """Outward unit normals from the occupancy-field gradient at the
        vertices (reference generation.py:430-455): n = -∇occ / ||∇occ||
        (occupancy decreases moving out of the surface)."""
        import jax

        assert self._planes is not None, "call encode() first"
        net, params, planes = self.net, self.params, self._planes

        def occ_sum(pts):
            return net.apply(params, planes, pts[None], method="decode_occupancy").sum()

        grad = jax.grad(occ_sum)(jnp.asarray(vertices, jnp.float32))
        g = np.asarray(grad)
        n = -g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        return n

    def refine_mesh(self, mesh: TriMesh, steps: int, lr: float = 1e-4) -> TriMesh:
        """Gradient-based vertex refinement (reference generation.py:457-519):
        move face-sample points onto the decision boundary and align face
        normals with the field gradient, by RMSprop on the vertices."""
        import jax
        import optax

        faces = jnp.asarray(mesh.faces)
        v = jnp.asarray(mesh.vertices, jnp.float32)
        planes = self._planes
        net, params = self.net, self.params

        def occ_logits(points):
            return net.apply(params, planes, points[None], method="decode_occupancy")[0]

        def loss_fn(verts, key):
            tri = verts[faces]  # (F, 3, 3)
            w = jax.random.dirichlet(key, jnp.ones(3), (tri.shape[0],))
            pts = jnp.einsum("fk,fkd->fd", w, tri)
            logits = occ_logits(pts)
            target = jax.nn.sigmoid(logits)
            loss_target = ((target - 0.5) ** 2).mean()
            grad = jax.grad(lambda p: occ_logits(p).sum())(pts)
            n_pred = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-9)
            fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
            fn = fn / (jnp.linalg.norm(fn, axis=-1, keepdims=True) + 1e-9)
            loss_normal = ((fn + n_pred) ** 2).sum(-1).mean()
            return loss_target + 0.01 * loss_normal

        opt = optax.rmsprop(lr)
        state = opt.init(v)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def step(vv, ss, kk):
            g = jax.grad(loss_fn)(vv, kk)
            updates, ss = opt.update(g, ss)
            return optax.apply_updates(vv, updates), ss

        for _ in range(steps):
            key, sub = jax.random.split(key)
            v, state = step(v, state, sub)
        return TriMesh(np.asarray(v), mesh.faces)

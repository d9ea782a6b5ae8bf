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


def compact_mask_anchored(mask3d: jnp.ndarray, k_half: int, k: int,
                          sort: bool = False):
    """Flat indices of True cells of a cubic 3D mask — anchored two-level
    compaction.

    ``jnp.nonzero(size=)`` over a dense fine lattice is the dominant cost of
    the device refine chain on TPU (measured round 4: ~9 ms per MILLION mask
    elements — 153 ms at 257^3, twice per call). This computes the same
    indices through two compactions at ~1/8 and ~list scale:

        1. anchor mask A[a] = any of the 2x2x2 block at 2a is True
           (reshape-any, elementwise-cheap), nonzero over (P/2)^3,
        2. expand each of the <= k_half active anchors to its 8 block cells
           arithmetically, flag by the original mask (gather), and compact
           the 8*k_half candidate list.

    Anchors partition the lattice, so each True cell appears exactly once.
    Returns (idx (k,) int32 with 0 fill, count, anchor_count); results are
    complete ONLY if count <= k AND anchor_count <= k_half — callers must
    check both (tier fallback). With ``sort`` the valid prefix is ascending
    like ``jnp.nonzero``'s output (cell order affects band/mesh vertex
    ordering); without it the order is anchor-major.
    """
    P = mask3d.shape[0]
    ph = (P + 1) // 2
    mp = jnp.pad(mask3d, ((0, 2 * ph - P),) * 3)
    anchors = mp.reshape(ph, 2, ph, 2, ph, 2).any(axis=(1, 3, 5))
    cnt_a = anchors.sum(dtype=jnp.int32)
    (aidx,) = jnp.nonzero(anchors.reshape(-1), size=k_half, fill_value=0)
    ax = aidx // (ph * ph)
    ay = (aidx // ph) % ph
    az = aidx % ph
    # 8 block cells per anchor, (x, y, z)-lex so each anchor's children are
    # flat-ascending; dims of mp (2*ph) keep out-of-range children False
    off = np.arange(8)
    cx = 2 * ax[:, None] + (off >> 2)
    cy = 2 * ay[:, None] + ((off >> 1) & 1)
    cz = 2 * az[:, None] + (off & 1)
    flags = mp[cx, cy, cz] & (jnp.arange(k_half, dtype=jnp.int32) < cnt_a)[:, None]
    flat = ((cx * P + cy) * P + cz).astype(jnp.int32).reshape(-1)
    count = flags.sum(dtype=jnp.int32)
    (slot,) = jnp.nonzero(flags.reshape(-1), size=k, fill_value=0)
    valid = jnp.arange(k, dtype=jnp.int32) < count
    idx = jnp.where(valid, flat[slot], 0)
    if sort:
        import jax

        idx = jax.lax.sort(jnp.where(valid, idx, jnp.int32(2**31 - 1)))
        idx = jnp.where(valid, idx, 0)
    return idx, count, cnt_a


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
                 refinement_step: int = 0, strategy: str = "auto",
                 precision: str = "fp32"):
        import jax

        self.net = net
        # commit params to device once: msgpack-loaded params are host numpy
        # arrays, and passing those to a jitted fn re-ships them through the
        # (slow) host link on EVERY call
        self.params = jax.device_put(params)
        self.threshold = float(threshold)
        self.resolution0 = resolution0
        self.upsampling_steps = upsampling_steps
        self.points_batch_size = points_batch_size
        self.padding = padding
        self.simplify_nfaces = simplify_nfaces
        self.refinement_step = refinement_step
        final_res = resolution0 * (2**upsampling_steps)
        if strategy == "auto":
            # one-shot dense decode wins while the lattice fits comfortably
            # on device; above that the one-program device refinement chain
            # (dense at resolution0 + sparse shell decode per level) beats
            # the full-lattice decode (measured at 256^3, round 3)
            strategy = "dense" if final_res <= 128 else "refine"
        assert strategy in ("dense", "refine"), strategy
        self.strategy = strategy
        # 'bf16' runs the dense occupancy decode with a bf16 trunk (MXU native
        # speed); iso-surface interpolation only needs ~3 digits near the
        # threshold, and the band/corner values are fetched as fp16 anyway.
        # Encoding and postprocess stay fp32.
        assert precision in ("fp32", "bf16"), precision
        self.compute_dtype = jnp.bfloat16 if precision == "bf16" else None
        self.band_cells = 49152  # static device->host band buffer (cells)
        # device-refine-chain budgets. At refinement level l (fine lattice
        # r_l = resolution0 * 2^l) the program decodes only the lattice
        # points touching active (straddle, 6-dilated) cells: ~9.3 unique
        # stencil points per active cell (28 new points per 3-cell column;
        # adjacent stencils share points), and the active shell scales with
        # surface area ~ r^2. Budget the finest level like the measured
        # one-level design (12x margin over the ~1%-straddle x3-dilation
        # density seen at 128^3) and scale down 4x per coarser level.
        top_cells = min(65536, (final_res // 2 + 1) ** 3)
        # straddling FINE cells emitted as the band (surface shell at final)
        self.refine_fine_cells = min(131072, 8 * top_cells)
        self.refine_point_cells = tuple(
            min(
                (resolution0 * 2**lvl + 1) ** 3,
                max(32768, (12 * top_cells) >> (2 * (upsampling_steps - lvl))),
            )
            for lvl in range(1, upsampling_steps + 1)
        )
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
        self._dense = jax.jit(self._build_dense_eval(final_res + 1))
        self._band = jax.jit(self._build_band_eval(final_res + 1))
        # tiered refine programs: the half-budget tier covers typical scenes
        # at ~half the fine-decode FLOPs and half the band-fetch bytes; the
        # full tier only runs on overflow (then the host path as last resort)
        self._refine_tiers = (
            [
                (self.refine_fine_cells // 2,
                 tuple(k // 2 for k in self.refine_point_cells)),
                (self.refine_fine_cells, self.refine_point_cells),
            ]
            if upsampling_steps >= 1 else []
        )
        self._refine_band_cache = {}
        self._jit_cache = {}

    def _build_dense_eval(self, n: int):
        """One device program: decode occupancy on the full (n, n, n) lattice.

        The hierarchical path (geometry/refine.py) saves decoder FLOPs but
        pays one host<->device round-trip per chunk per level — on a remote
        accelerator those dispatches dominate (~0.5 s/scene warm). Here the
        mesh lattice is a tensor product, so the planner's lattice-factorized
        decode applies verbatim (inference/dense_decode.py: bilinear sampling
        as two matmuls per plane, fc_c projections on the 2D lattices): one
        dispatch, MXU-shaped work, and ONE result fetch — in fp16, since the
        tunnel's host-fetch bandwidth (~45 MB/s) would otherwise dominate and
        iso-surface interpolation only needs ~3 digits near the threshold.
        """
        from giga_tpu.inference.dense_decode import decode_dense
        from giga_tpu.inference.planner import _lattice_features

        cfg = self.net.cfg
        box_size = 1.0 + self.padding
        coords = jnp.linspace(-box_size / 2, box_size / 2, n, dtype=jnp.float32)

        def dense(params, planes):
            p = params["params"]["decoder_occ"]
            planes = {t: v[0] for t, v in planes.items()}
            if self.compute_dtype is not None:
                import jax

                p = jax.tree.map(lambda a: a.astype(self.compute_dtype), p)
                planes = {t: v.astype(self.compute_dtype) for t, v in planes.items()}
            feats = _lattice_features(planes, coords, cfg)
            out = decode_dense(p, feats, coords, cfg.decoder.n_blocks)
            return out[0, ..., 0].astype(jnp.float16)

        return dense

    def _build_band_eval(self, n: int):
        """Dense decode + on-device surface-band extraction.

        Fetching the full (n, n, n) logit grid costs ~4n^3 bytes over the
        host link; the iso-surface only needs the ~1% of cells whose corners
        straddle the threshold. This program pads the lattice (so the surface
        closes at the boundary), finds active cells, and compacts their flat
        ids + 8 corner values into fixed-size buffers — ~10x fewer bytes per
        scene. Returns (cell_ids i32, corner_vals f16 (K, 8), count); if
        count > K the host falls back to the full-grid fetch.
        """
        logit_th = float(np.log(self.threshold) - np.log(1.0 - self.threshold))
        dense = self._build_dense_eval(n)
        K = self.band_cells
        C = n + 1  # cells per axis of the padded (n+2)^3 lattice

        def band(params, planes):
            logits = dense(params, planes).astype(jnp.float32)
            g = jnp.pad(logits, 1, constant_values=-6.0e4)  # fp16-safe "outside"
            inside = g > logit_th

            def cells(a):
                s = None
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            v = a[dx : C + dx, dy : C + dy, dz : C + dz]
                            s = v if s is None else s + v
                return s

            n_in = cells(inside.astype(jnp.int32))
            active = (n_in > 0) & (n_in < 8)
            # anchored compaction (see compact_mask_anchored): fold an
            # anchor-budget overflow into count so the host falls back
            idx, count, cnt_a = compact_mask_anchored(active, K // 2, K,
                                                      sort=True)
            count = jnp.maximum(count, jnp.where(cnt_a > K // 2, K + 1, 0))
            x = idx // (C * C)
            rem = idx % (C * C)
            y = rem // C
            z = rem % C
            vals = jnp.stack(
                [
                    g[x + (ci & 1), y + ((ci >> 1) & 1), z + ((ci >> 2) & 1)]
                    for ci in range(8)
                ],
                axis=-1,
            )
            return idx.astype(jnp.int32), vals.astype(jnp.float16), count

        return band

    def _refine_band_fn(self, tier: int, batched: bool = False):
        """Lazily-built jitted refine-chain program for budget tier ``tier``
        (``batched``: the (params, (B, R, R, R)) variant)."""
        import jax

        key = (tier, batched)
        if key not in self._refine_band_cache:
            K_f, K_ps = self._refine_tiers[tier]
            single, batch = self._build_refine_chain_eval(K_f, K_ps)
            self._refine_band_cache[key] = jax.jit(batch if batched else single)
        return self._refine_band_cache[key]

    def _build_refine_chain_eval(self, K_f: int, K_ps: tuple,
                                 profile_stop: str | None = None):
        """Multi-level hierarchical surface refinement as a SINGLE device
        program (role of the reference's MISE octree, mise.pyx:33-44, driven
        by generation.py:126-142) — the device mirror of refine_grid
        (geometry/refine.py), level for level.

        ``profile_stop`` (profiling only; scripts/profile_meshgen256.py)
        truncates the chain and returns a scalar reduction of every live
        intermediate so serial-chain prefix differencing can split the
        program's device cost by stage: ``"dense"`` stops after the
        resolution0 dense decode; ``"maskN"`` after level N's upsample +
        touched-point compaction (before its sparse decode); ``"lvlN"``
        after level N's decode + scatter; ``None`` is the real program.

        TPU-first redesign: the incremental octree becomes one fixed-shape
        XLA program. A dense decode runs at ``resolution0`` only (the
        round-3 one-level version decoded dense at final/2, which at 256^3
        was ~80% of its decode rows), then each refinement level doubles the
        lattice: (1) straddle cells of the running dense grid, dilated by
        one (6-neighborhood, matching refine_grid's binary_dilation), (2)
        trilinear upsample — decided regions keep interpolated values,
        exactly refine_grid's contract, and since trilinear interpolation
        is convex, a non-straddling cell can never produce straddling
        children, (3) the UNIQUE fine lattice points touching active cells
        (f = 2c + off, off in {0,1,2}^3 — the mask is the active mask
        upsampled onto even positions via lax.pad interior padding, OR-ed
        over the 27 stencil shifts; adjacent cells share stencil points, so
        ~9.3 points decode per cell instead of 27) compact to a static
        (K_p,) buffer via nonzero(size=K_p) and decode in one
        ``decode_lattice_points`` call, (4) scatter back into the dense
        grid. The final grid emits the dense path's compact band format:
        ~20 B per straddling cell crosses the link, nothing else. Any
        level's touched-point count exceeding its budget makes the caller
        fall back to the next tier or the exact host path.

        Returns (single, batched): ``single(params, planes)`` for the
        cached-encoding path and ``batched(params, (B, R, R, R) grids)``
        which encodes and vmaps the same per-scene core.
        """
        import jax

        from giga_tpu.inference.dense_decode import (
            decode_dense,
            decode_lattice_points,
        )
        from giga_tpu.inference.planner import _lattice_features

        cfg = self.net.cfg
        box_size = 1.0 + self.padding
        logit_th = float(np.log(self.threshold) - np.log(1.0 - self.threshold))
        OUT = -6.0e4  # fp16-safe "outside" fill for the boundary pad
        coords0 = jnp.linspace(
            -box_size / 2, box_size / 2, self.resolution0 + 1, dtype=jnp.float32
        )
        S = self.upsampling_steps

        def straddle_cells(g):
            n = g.shape[0]
            ins = g > logit_th
            s = None
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        v = ins[dx : n - 1 + dx, dy : n - 1 + dy,
                                dz : n - 1 + dz].astype(jnp.int32)
                        s = v if s is None else s + v
            return (s > 0) & (s < 8)

        def dilate6(a):
            n = a.shape[0]
            ap = jnp.pad(a, 1)
            d = a
            for ax in range(3):
                lo = [slice(1, n + 1)] * 3
                hi = [slice(1, n + 1)] * 3
                lo[ax] = slice(0, n)
                hi[ax] = slice(2, n + 2)
                d = d | ap[tuple(lo)] | ap[tuple(hi)]
            return d

        def upsample_double(g):
            # trilinear (m+1)^3 -> (2m+1)^3 (refine.py::_upsample_double);
            # interleave by stack+reshape — XLA fuses it, no scatter
            for ax in range(3):
                a = jnp.moveaxis(g, ax, 0)
                mid = 0.5 * (a[:-1] + a[1:])
                body = jnp.stack([a[:-1], mid], 1).reshape((-1,) + a.shape[1:])
                g = jnp.moveaxis(jnp.concatenate([body, a[-1:]], 0), 0, ax)
            return g

        def chain_core(p, planes_d):
            # per-scene chain on already-cast decoder params + planes; the
            # batched path vmaps this over the scene axis
            feats0 = _lattice_features(planes_d, coords0, cfg)
            g = decode_dense(p, feats0, coords0, cfg.decoder.n_blocks)[
                0, ..., 0
            ].astype(jnp.float32)
            if profile_stop == "dense":
                return jnp.sum(g)
            counts_p = []
            for lvl in range(1, S + 1):
                K_p = K_ps[lvl - 1]
                active = dilate6(straddle_cells(g))
                g = upsample_double(g)
                P = g.shape[0]  # fine lattice points per axis this level
                # base[2c] = active[c]; touch[f] = OR_{off} base[f - off]
                base = jax.lax.pad(active, False, [(0, 2, 1)] * 3)
                bp = jnp.pad(base, ((2, 0),) * 3)
                m = None
                for ox in (0, 1, 2):
                    for oy in (0, 1, 2):
                        for oz in (0, 1, 2):
                            v = bp[2 - ox : 2 - ox + P,
                                   2 - oy : 2 - oy + P,
                                   2 - oz : 2 - oz + P]
                            m = v if m is None else m | v
                pidx, count_p, cnt_a = compact_mask_anchored(m, K_p // 2, K_p)
                # anchor-budget overflow -> force the level budget check to
                # fail (count_p undercounts once anchors overflow)
                counts_p.append(jnp.maximum(
                    count_p, jnp.where(cnt_a > K_p // 2, K_p + 1, 0)
                ))
                if profile_stop == f"mask{lvl}":
                    return (jnp.sum(g) + jnp.sum(pidx).astype(jnp.float32)
                            + count_p.astype(jnp.float32))
                valid = jnp.arange(K_p, dtype=jnp.int32) < count_p
                px = pidx // (P * P)
                py = (pidx // P) % P
                pz = pidx % P
                coords = jnp.linspace(
                    -box_size / 2, box_size / 2, P, dtype=jnp.float32
                )
                feats = _lattice_features(planes_d, coords, cfg)
                vals = decode_lattice_points(
                    p, feats, coords, px, py, pz, cfg.decoder.n_blocks
                )[0, :, 0]
                flat = g.reshape(-1)
                # overflow slots keep the interpolated value (the tier is
                # rejected on overflow anyway; this just keeps writes sane)
                vals = jnp.where(valid, vals.astype(jnp.float32), flat[pidx])
                g = flat.at[pidx].set(vals, mode="drop").reshape(P, P, P)
                if profile_stop == f"lvl{lvl}":
                    return jnp.sum(g) + jnp.sum(
                        jnp.stack(counts_p)
                    ).astype(jnp.float32)

            # band emission over the final dense grid — identical to the
            # dense path's format, so the host reuses _mesh_from_band
            n = g.shape[0]
            gp = jnp.pad(g, 1, constant_values=OUT)
            C = n + 1
            idx, count_f, cnt_af = compact_mask_anchored(
                straddle_cells(gp), K_f // 2, K_f, sort=True
            )
            count_f = jnp.maximum(
                count_f, jnp.where(cnt_af > K_f // 2, K_f + 1, 0)
            )
            x = idx // (C * C)
            y = (idx // C) % C
            z = idx % C
            vals8 = jnp.stack(
                [
                    gp[x + (ci & 1), y + ((ci >> 1) & 1), z + ((ci >> 2) & 1)]
                    for ci in range(8)
                ],
                axis=-1,
            )
            return (idx.astype(jnp.int32), vals8.astype(jnp.float16),
                    count_f, jnp.stack(counts_p))

        def cast(params, planes_d):
            p = params["params"]["decoder_occ"]
            if self.compute_dtype is not None:
                p = jax.tree.map(lambda a: a.astype(self.compute_dtype), p)
                planes_d = {
                    t: v.astype(self.compute_dtype) for t, v in planes_d.items()
                }
            return p, planes_d

        def refine_chain(params, planes):
            p, planes_d = cast(params, {t: v[0] for t, v in planes.items()})
            return chain_core(p, planes_d)

        def refine_chain_batched(params, grids):
            planes = self.net.apply(
                params, grids.astype(jnp.float32), method="encode"
            )
            p, planes_d = cast(params, planes)
            return jax.vmap(chain_core, in_axes=(None, 0))(p, planes_d)

        return refine_chain, refine_chain_batched

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

    def _build_band_eval_batched(self, n: int):
        """Batched variant of the band program: (params, (B, R, R, R)) ->
        per-scene (cell_ids, corner_vals, count). One dispatch reconstructs a
        whole evaluation batch; the per-fetch overhead of the host link
        amortizes across scenes."""
        import jax

        from giga_tpu.inference.dense_decode import (
            decode_dense_batched,
            sample_planes_on_lattice_batched,
        )

        cfg = self.net.cfg
        box_size = 1.0 + self.padding
        coords = jnp.linspace(-box_size / 2, box_size / 2, n, dtype=jnp.float32)
        logit_th = float(np.log(self.threshold) - np.log(1.0 - self.threshold))
        K = self.band_cells
        C = n + 1

        def band_one(logits):
            g = jnp.pad(logits, 1, constant_values=-6.0e4)
            inside = g > logit_th

            s = None
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        v = inside[dx : C + dx, dy : C + dy, dz : C + dz]
                        s = v.astype(jnp.int32) if s is None else s + v
            active = (s > 0) & (s < 8)
            idx, count, cnt_a = compact_mask_anchored(active, K // 2, K,
                                                      sort=True)
            count = jnp.maximum(count, jnp.where(cnt_a > K // 2, K + 1, 0))
            x = idx // (C * C)
            rem = idx % (C * C)
            y = rem // C
            z = rem % C
            vals = jnp.stack(
                [
                    g[x + (ci & 1), y + ((ci >> 1) & 1), z + ((ci >> 2) & 1)]
                    for ci in range(8)
                ],
                axis=-1,
            )
            return idx.astype(jnp.int32), vals.astype(jnp.float16), count

        def band_batched(params, grids):
            planes = self.net.apply(
                params, grids.astype(jnp.float32), method="encode"
            )
            dec_params = params["params"]["decoder_occ"]
            if self.compute_dtype is not None:
                dec_params = jax.tree.map(
                    lambda a: a.astype(self.compute_dtype), dec_params
                )
                planes = {t: v.astype(self.compute_dtype) for t, v in planes.items()}
            if "grid" in planes:
                from giga_tpu.ops.sampling import sample_grid

                pts = jnp.stack(
                    jnp.meshgrid(coords, coords, coords, indexing="ij"), axis=-1
                ).reshape(-1, 3)
                out = jax.vmap(
                    lambda g: sample_grid(g, pts, cfg.decoder.padding)
                )(planes["grid"])
                feats = {"dense": out.reshape(out.shape[0], n, n, n, -1)}
            else:
                feats = sample_planes_on_lattice_batched(
                    planes, coords, cfg.encoder.plane_resolution,
                    cfg.decoder.padding,
                )
            logits = decode_dense_batched(
                dec_params, feats, coords, cfg.decoder.n_blocks,
            )[0, ..., 0]
            return jax.vmap(band_one)(logits)

        return band_batched

    def generate_meshes(self, tsdf_grids: np.ndarray) -> list:
        """Batched reconstruction: (B, R, R, R) TSDFs -> list of B meshes.

        Same surface as ``generate_mesh`` per scene, but the occupancy
        decode + band extraction for the whole batch is ONE device program
        and ONE fetch (fixed per-call link overheads amortize ~B-fold).
        Both strategies batch (the refine chain is vmapped per scene at the
        half-budget tier; scenes overflowing it fall back individually);
        without the native kernel a per-scene loop runs instead.
        """
        import jax

        from giga_tpu.geometry.native import get_lib, marching_tetrahedra_cells

        grids = np.asarray(tsdf_grids, np.float32)
        assert grids.ndim == 4, "expected (B, R, R, R)"
        B = grids.shape[0]
        triplane = "grid" not in self.net.cfg.encoder.plane_types
        if get_lib() is None or (
            self.strategy == "refine" and not (self._refine_tiers and triplane)
        ):
            return [self.generate_mesh(g, return_stats=False) for g in grids]

        if self.strategy == "refine":
            n = self.resolution0 * (2**self.upsampling_steps) + 1
            K_f, K_ps = self._refine_tiers[0]
            ids, vals, count_f, counts_p = jax.device_get(
                self._refine_band_fn(0, batched=True)(
                    self.params, jnp.asarray(grids)
                )
            )
            logit_th = float(
                np.log(self.threshold) - np.log(1.0 - self.threshold)
            )
            box_size = 1.0 + self.padding
            meshes = []
            for b in range(B):
                if int(count_f[b]) <= K_f and all(
                    int(c) <= k for c, k in zip(counts_p[b], K_ps)
                ):
                    cnt = int(count_f[b])
                    meshes.append(self._mesh_from_band(
                        ids[b, :cnt], vals[b, :cnt], logit_th, box_size, {}
                    ))
                else:  # half-tier overflow: per-scene fallback, but skip the
                    # half tier — it just overflowed with the same budgets
                    meshes.append(self.generate_mesh(
                        grids[b], return_stats=False, _min_tier=1
                    ))
            return meshes

        key = ("band_batched", B)
        if key not in self._jit_cache:
            n = self.resolution0 * (2**self.upsampling_steps) + 1
            self._jit_cache[key] = (jax.jit(self._build_band_eval_batched(n)), n)
        fn, n = self._jit_cache[key]
        ids, vals, counts = jax.device_get(fn(self.params, jnp.asarray(grids)))

        logit_th = float(np.log(self.threshold) - np.log(1.0 - self.threshold))
        box_size = 1.0 + self.padding
        meshes = []
        for b in range(B):
            cnt = int(counts[b])
            if cnt > self.band_cells:  # overflow: exact per-scene fallback
                meshes.append(self.generate_mesh(grids[b], return_stats=False))
                continue
            meshes.append(self._mesh_from_band(
                ids[b, :cnt], vals[b, :cnt], logit_th, box_size, {}
            ))
        return meshes

    def generate_mesh(self, tsdf_grid: np.ndarray, return_stats: bool = True,
                      _min_tier: int = 0):
        """TSDF grid -> (mesh in [-0.5, 0.5]^3 coords[, stats dict]).

        ``_min_tier``: first refine-budget tier to attempt (internal; the
        batched path passes 1 after the half tier already overflowed)."""
        stats = {}
        t0 = time.time()
        self.encode(tsdf_grid)
        stats["time (encode inputs)"] = time.time() - t0

        logit_th = float(np.log(self.threshold) - np.log(1.0 - self.threshold))
        box_size = 1.0 + self.padding

        if self.strategy == "dense":
            from giga_tpu.geometry.native import get_lib

            t0 = time.time()
            if get_lib() is not None:
                import jax

                idx, vals, count = jax.device_get(
                    self._band(self.params, self._planes)
                )
                count = int(count)
            else:
                count = self.band_cells + 1  # no native kernel: full-grid path
            if count <= self.band_cells:
                stats["time (eval points)"] = time.time() - t0
                mesh = self._mesh_from_band(idx[:count], vals[:count], logit_th,
                                            box_size, stats)
            else:  # band overflow: exact fallback through the full grid
                value_grid = np.asarray(
                    self._dense(self.params, self._planes), np.float64
                )
                stats["time (eval points)"] = time.time() - t0
                mesh = self.extract_mesh(value_grid, logit_th, box_size, stats)
        else:
            from giga_tpu.geometry.native import get_lib

            mesh = None
            if (self._refine_tiers and get_lib() is not None
                    and "grid" not in self._planes):
                import jax

                t0 = time.time()
                for tier in range(_min_tier, len(self._refine_tiers)):
                    K_f, K_ps = self._refine_tiers[tier]
                    ids, vals, count_f, counts_p = jax.device_get(
                        self._refine_band_fn(tier)(self.params, self._planes)
                    )
                    if int(count_f) <= K_f and all(
                        int(c) <= k for c, k in zip(counts_p, K_ps)
                    ):
                        stats["time (eval points)"] = time.time() - t0
                        stats["refine (device)"] = True
                        stats["refine tier"] = tier
                        stats["refine cells (band/points-per-level)"] = (
                            int(count_f), tuple(int(c) for c in counts_p)
                        )
                        cf = int(count_f)
                        mesh = self._mesh_from_band(
                            ids[:cf], vals[:cf], logit_th, box_size, stats
                        )
                        break
            if mesh is None:  # budget overflow or unsupported: exact host path
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

    def _mesh_from_band(self, cell_ids, corner_vals, logit_th: float,
                        box_size: float, stats: dict) -> TriMesh:
        """Triangulate the device-extracted surface band (padded-lattice cell
        ids + fp16 corner values) with the sparse marching kernel."""
        from giga_tpu.geometry.native import marching_tetrahedra_cells

        t0 = time.time()
        n = self.resolution0 * (2**self.upsampling_steps) + 1
        verts, faces = marching_tetrahedra_cells(
            cell_ids.astype(np.int64), corner_vals.astype(np.float64),
            (n + 2, n + 2, n + 2), logit_th,
        )
        stats["time (marching cubes)"] = time.time() - t0
        verts = (verts - 1.0) / (n - 1)  # undo padding, [0, 1]
        verts = box_size * (verts - 0.5)
        return self._postprocess(TriMesh(verts, faces), stats)

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
        return self._postprocess(TriMesh(verts, faces), stats)

    def _postprocess(self, mesh: TriMesh, stats: dict) -> TriMesh:
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

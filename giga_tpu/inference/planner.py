"""Grasp planners: TSDF in -> ranked grasps out, fully on device.

``GIGAPlanner`` is the VGNImplicit equivalent (reference:
detection_implicit.py:17-85); ``VGNPlanner`` the dense-CNN VGN equivalent
(detection.py:26-81). The entire pipeline — encoding, dense 40^3 implicit
decode, Gaussian smoothing, surface masking, bounding, NMS, top-K — is one
jitted XLA program; the host only converts the top-K arrays into Grasp
objects.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from giga_tpu.core.config import GIGAConfig, PlannerConfig
from giga_tpu.core.grasp import Grasp
from giga_tpu.core.transform import Rotation, Transform
from giga_tpu.inference.dense_decode import (
    decode_affordance_dense,
    decode_affordance_dense_batched,
    lattice_coords,
    sample_planes_on_lattice,
    sample_planes_on_lattice_batched,
)
from giga_tpu.inference.postprocess import (
    GraspCandidates,
    bound_quality,
    mask_quality,
    select_grasps,
    select_grasps_batched,
)
from giga_tpu.models.registry import load_network


class State(NamedTuple):
    """Planner input: a TSDFVolume (or raw grid) + optional extras."""

    tsdf: object
    pc: object = None
    tsdf_process: object = None


def _lattice_positions(coords: jnp.ndarray) -> jnp.ndarray:
    x, y, z = jnp.meshgrid(coords, coords, coords, indexing="ij")
    return jnp.stack([x, y, z], axis=-1)


def _lattice_features(planes: dict, coords: jnp.ndarray, model_cfg: GIGAConfig):
    """Decoder input features on the dense query lattice: factorized bilinear
    sampling for triplanes, trilinear grid sampling for the 'grid' variant."""
    if "grid" in planes:
        from giga_tpu.ops.sampling import sample_grid

        R = coords.shape[0]
        pts = _lattice_positions(coords).reshape(-1, 3)
        dense = sample_grid(planes["grid"], pts, model_cfg.decoder.padding)
        return {"dense": dense.reshape(R, R, R, -1)}
    return sample_planes_on_lattice(
        planes, coords, model_cfg.encoder.plane_resolution, model_cfg.decoder.padding
    )


def _maybe_cast(params, tsdf, dtype):
    """bf16 serving cast: params + input in dtype; postprocess stays fp32."""
    if dtype is None:
        return params, tsdf
    return jax.tree.map(lambda a: a.astype(dtype), params), tsdf.astype(dtype)


def build_giga_planner_fn(net, model_cfg: GIGAConfig, planner_cfg: PlannerConfig, size: float,
                          use_pallas: bool = False, dtype=None):
    """Returns jitted (params, tsdf (R,R,R), tsdf_process (R,R,R)) -> (GraspCandidates, qual_vol, rot_vol, width_vol).

    ``use_pallas`` selects the fused-trunk Pallas decode on TPU. Measured on
    v5e with true-barrier timings (single scene): XLA 1.78 ms fp32 / 0.77 ms
    bf16 vs Pallas 1.81 / 0.98 — XLA's cross-op fusion wins at B=1, so it is
    the default here; the fused kernel wins for batched serving (see
    ``build_batched_giga_planner_fn``) where the XLA trunk is HBM-bound.

    ``dtype=jnp.bfloat16`` runs the network trunk (encoder + dense decode) in
    bf16 — the MXU's native precision — while masking/NMS/top-K stay fp32.
    Grasp decisions are guarded by tests/test_bf16_serving.py.
    """
    import contextlib

    voxel_size = size / planner_cfg.resolution
    n_blocks = model_cfg.decoder.n_blocks
    pallas_ok = use_pallas and jax.default_backend() == "tpu"

    def plan(params, tsdf, tsdf_process):
        # fp32 path pins full-precision matmuls: the model was validated
        # against the torch reference at full precision, and TPU's default
        # bf16-pass matmuls would silently change grasp scores. The explicit
        # bf16 path opts into the speed/precision trade deliberately.
        ctx = (jax.default_matmul_precision("highest") if dtype is None
               else contextlib.nullcontext())
        with ctx:
            p, tsdf_c = _maybe_cast(params["params"], tsdf, dtype)
            planes = net.apply(
                {"params": {"encoder": p["encoder"]}}, tsdf_c[None], method="encode"
            )
            planes = {t: v[0] for t, v in planes.items()}
            coords = lattice_coords(planner_cfg.resolution)
            feats = _lattice_features(planes, coords, model_cfg)
            if pallas_ok:
                from giga_tpu.ops.pallas.decoder_kernel import decode_affordance_dense_pallas

                qual, rot, width = decode_affordance_dense_pallas(
                    p["decoder_aff"], feats, coords, n_blocks,
                    compute_dtype=jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32,
                )
            else:
                qual, rot, width = decode_affordance_dense(
                    p["decoder_aff"], feats, coords, n_blocks
                )
            # postprocess always runs fp32 (threshold/NMS/top-K ordering)
            qual, rot, width = (
                x.astype(jnp.float32) for x in (qual, rot, width)
            )
            raw = (qual, rot, width)
            qual = mask_quality(qual, tsdf_process, width, planner_cfg)
            qual = bound_quality(qual, voxel_size, planner_cfg)
            cands = select_grasps(qual, rot, width, _lattice_positions(coords), planner_cfg)
            return cands, raw

    return jax.jit(plan)


def stack_params(params_list):
    """Stack K checkpoints' pytrees along a new leading ensemble axis."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *params_list)


def build_ensemble_giga_planner_fn(net, model_cfg: GIGAConfig,
                                   planner_cfg: PlannerConfig, size: float,
                                   dtype=None, combine: str = "mean"):
    """Ensemble-of-checkpoints planner: params carry a leading K axis.

    Runs encoder + dense affordance decode for each of the K independently
    trained members (one vmapped program — the members' matmuls batch on the
    MXU), then combines BEFORE the shared fp32 postprocess. Two combiners:

    ``combine="mean"``:
      - quality: mean of the members' sigmoid probabilities;
      - rotation: quaternion mean with per-voxel sign alignment to member 0
        (q and -q are the same rotation; without alignment antipodal pairs
        cancel), renormalized;
      - width: mean.

    ``combine="max"`` (union-of-peaks): independently trained members are
    confident at DIFFERENT voxels, and the threshold-gated postprocess
    (qual_th) passes a mean only where members agree — which measured 11
    points BELOW the best member on the wide GSR protocol. Max keeps every
    member's peaks: per voxel, quality = max over members and rotation/width
    come from the argmax member (never blended, so each surviving voxel is a
    grasp some member fully believes in).

    K-fold serving cost; combining probabilities across independent
    trajectories is the remaining quality lever after within-trajectory
    soups failed to transfer (BACKLOG round-4 status). The reference has no
    analog (detection_implicit.py loads exactly one network).
    """
    if combine not in ("mean", "max"):
        raise ValueError(f"unknown ensemble combine {combine!r}")
    import contextlib

    voxel_size = size / planner_cfg.resolution
    n_blocks = model_cfg.decoder.n_blocks
    coords = lattice_coords(planner_cfg.resolution)

    def member_forward(p, tsdf_c):
        planes = net.apply(
            {"params": {"encoder": p["encoder"]}}, tsdf_c[None], method="encode"
        )
        planes = {t: v[0] for t, v in planes.items()}
        feats = _lattice_features(planes, coords, model_cfg)
        qual, rot, width = decode_affordance_dense(
            p["decoder_aff"], feats, coords, n_blocks
        )
        return (qual.astype(jnp.float32), rot.astype(jnp.float32),
                width.astype(jnp.float32))

    def plan(params, tsdf, tsdf_process):
        ctx = (jax.default_matmul_precision("highest") if dtype is None
               else contextlib.nullcontext())
        with ctx:
            p, tsdf_c = _maybe_cast(params["params"], tsdf, dtype)
            quals, rots, widths = jax.vmap(
                member_forward, in_axes=(0, None))(p, tsdf_c)
            if combine == "mean":
                qual = quals.mean(axis=0)
                sign = jnp.sign(
                    jnp.sum(rots * rots[:1], axis=-1, keepdims=True))
                sign = jnp.where(sign == 0, 1.0, sign)
                rot = (rots * sign).mean(axis=0)
                rot = rot / jnp.maximum(
                    jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
                width = widths.mean(axis=0)
            else:  # max: per-voxel winner takes quality AND rot/width
                qual = quals.max(axis=0)
                best = jnp.argmax(quals, axis=0)
                rot = jnp.take_along_axis(
                    rots, best[None, ..., None], axis=0)[0]
                width = jnp.take_along_axis(widths, best[None], axis=0)[0]
            raw = (qual, rot, width)
            qual = mask_quality(qual, tsdf_process, width, planner_cfg)
            qual = bound_quality(qual, voxel_size, planner_cfg)
            cands = select_grasps(qual, rot, width,
                                  _lattice_positions(coords), planner_cfg)
            return cands, raw

    return jax.jit(plan)


def build_batched_giga_planner_fn(net, model_cfg: GIGAConfig, planner_cfg: PlannerConfig,
                                  size: float, dtype=None, use_pallas: bool = False,
                                  mesh=None, axis: str = "dp", sp_axis: str | None = None,
                                  pallas_fold_b1: bool = False,
                                  pallas_hidden_bf16: bool = False,
                                  pallas_transposed: bool = True,
                                  return_raw: bool = False):
    """Natively batched serving path: (params, (B,R,R,R), (B,R,R,R)) ->
    batched GraspCandidates. One program with a leading batch axis through
    encoder, lattice decode, stencils, and top-K — no vmap of the
    single-scene program, so XLA sees the batched matmuls directly and
    compiles a single fused pipeline.

    With ``mesh``, the batch axis is sharded over the device mesh (params
    replicated): each chip plans its shard of scenes independently — the
    whole pipeline is a pure map over scenes, so GSPMD partitions it with no
    collectives until the (small) result gather. B must divide by the mesh
    size.

    ``use_pallas`` runs the decode trunk as the fused VMEM-resident Pallas
    kernel — the batched XLA trunk materializes (B, R^3, heads*hidden)
    activations in HBM and is bandwidth-bound (B=64 on v5e: 590 scenes/s
    fp32 / 1278 bf16 XLA vs 865 / 2505 Pallas). ``pallas_transposed``
    (default, bit-exact) writes head outputs (O, rows) so lattice rows land
    on the 128-lane dim instead of padding O=12 up to 128 — r5 A/B at B=64
    bf16: 24.9 -> 16.3 ms/batch (2,571 -> 3,928 scenes/s), postprocess
    9.65 -> 4.13 ms. With ``mesh`` the batch axis
    is distributed via ``shard_map`` (GSPMD cannot partition a pallas_call,
    but shard_map runs the whole per-device program — including the kernel —
    independently per chip; the pipeline is a pure map over scenes, so no
    collectives exist to lose).

    ``sp_axis`` composes spatial sharding with data parallelism on a 2D mesh
    (e.g. Mesh((dp, sp))): the batch axis shards over ``axis`` AND the dense
    decode's hidden state shards its lattice x axis over ``sp_axis`` — one
    program covering a whole pod slice (dp x sp), XLA path only.

    ``return_raw=True`` additionally returns the full fp32 (qual, rot,
    width) volumes (for affordance visualization / debugging); the serving
    default returns ``(cands, None)`` so those ~98 MB/batch of casts and
    outputs are never materialized.
    """
    voxel_size = size / planner_cfg.resolution
    n_blocks = model_cfg.decoder.n_blocks

    import contextlib

    decode_constraint = None
    if mesh is not None and sp_axis is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert not use_pallas, "sp composition requires the XLA decode path"
        # (B, Rx, Ry, Rz, F) hidden state: batch over dp, lattice x over sp
        decode_constraint = NamedSharding(mesh, P(axis, sp_axis))

    def plan(params, tsdfs, tsdf_process):
        ctx = (jax.default_matmul_precision("highest") if dtype is None
               else contextlib.nullcontext())
        with ctx:
            p, tsdfs_c = _maybe_cast(params["params"], tsdfs, dtype)
            from giga_tpu.ops.pallas.stem_kernel import (
                can_encode_fused,
                encode_planes_fused,
            )

            if (use_pallas and jax.default_backend() == "tpu"
                    and can_encode_fused(model_cfg.encoder, tsdfs.shape)):
                # fused stem+pool kernel: the (B, R^3, C) voxel features
                # never round-trip HBM (3.3 -> ~1 ms of the batched encode)
                planes = encode_planes_fused(
                    p["encoder"], tsdfs_c, model_cfg.encoder,
                    compute_dtype=(jnp.bfloat16 if dtype == jnp.bfloat16
                                   else jnp.float32),
                )
            else:
                planes = net.apply(
                    {"params": {"encoder": p["encoder"]}}, tsdfs_c,
                    method="encode"
                )
            coords = lattice_coords(planner_cfg.resolution)
            if "grid" in planes:
                from giga_tpu.ops.sampling import sample_grid

                R = coords.shape[0]
                pts = _lattice_positions(coords).reshape(-1, 3)
                dense = jax.vmap(
                    lambda g: sample_grid(g, pts, model_cfg.decoder.padding)
                )(planes["grid"])
                feats = {"dense": dense.reshape(dense.shape[0], R, R, R, -1)}
            else:
                feats = sample_planes_on_lattice_batched(
                    planes, coords, model_cfg.encoder.plane_resolution,
                    model_cfg.decoder.padding,
                )
            if (use_pallas and "dense" not in feats
                    and jax.default_backend() == "tpu"):
                from giga_tpu.ops.pallas.decoder_kernel import (
                    decode_affordance_dense_pallas_batched,
                )

                qual, rot, width = decode_affordance_dense_pallas_batched(
                    p["decoder_aff"], feats, coords, n_blocks,
                    compute_dtype=jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32,
                    fold_b1=pallas_fold_b1, hidden_bf16=pallas_hidden_bf16,
                    transposed=pallas_transposed,
                )
            else:
                qual, rot, width = decode_affordance_dense_batched(
                    p["decoder_aff"], feats, coords, n_blocks,
                    shard_constraint=decode_constraint,
                )
            # thresholds/NMS/top-K ordering run fp32. With return_raw=False
            # (the serving default) rot/width stay in the trunk dtype until
            # the (B, K) top-k gather — the full-volume fp32 casts and the
            # (B, R^3, 6)-equivalent raw outputs (~98 MB/batch at B=64)
            # never materialize in HBM. Candidates are bit-identical either
            # way: bf16->fp32 casts are exact widenings, so casting after
            # the gather equals casting before it.
            raw = (tuple(x.astype(jnp.float32) for x in (qual, rot, width))
                   if return_raw else None)
            q32 = qual.astype(jnp.float32)
            masked = mask_quality(q32, tsdf_process,
                                  width.astype(jnp.float32), planner_cfg)
            masked = bound_quality(masked, voxel_size, planner_cfg)
            cands = select_grasps_batched(
                masked, rot, width, _lattice_positions(coords), planner_cfg
            )
            return cands, raw

    if mesh is None:
        return jax.jit(plan)
    from jax.sharding import NamedSharding, PartitionSpec as P

    if use_pallas:
        # shard_map: each device runs the full per-shard program (pallas
        # kernel included) on its B/n scenes; outputs stay batch-sharded
        from jax import shard_map

        sharded = shard_map(
            plan, mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(axis),
        )
        return jax.jit(sharded)

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis))
    return jax.jit(plan, in_shardings=(repl, batched, batched),
                   out_shardings=repl)


def build_sharded_giga_planner_fn(net, model_cfg: GIGAConfig, planner_cfg: PlannerConfig,
                                  size: float, mesh, axis: str = "sp"):
    """Spatially-sharded planner: the dense R^3 decode is partitioned along
    its x axis over a device mesh (SURVEY §2.3's 'spatial sharding of the
    grid-decode'). The decode is a pure map over query points and the plane
    features are ~600 KB, so they replicate and no halo exchange is needed
    in the trunk; GSPMD inserts halos only for the small postprocess stencils.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    voxel_size = size / planner_cfg.resolution
    n_blocks = model_cfg.decoder.n_blocks
    net_sharding = NamedSharding(mesh, P(axis))  # (Rx, Ry, Rz, heads*h)
    repl = NamedSharding(mesh, P())

    def plan(params, tsdf, tsdf_process):
        with jax.default_matmul_precision("highest"):
            p = params["params"]
            planes = net.apply({"params": {"encoder": p["encoder"]}}, tsdf[None], method="encode")
            planes = {t: v[0] for t, v in planes.items()}
            coords = lattice_coords(planner_cfg.resolution)
            feats = _lattice_features(planes, coords, model_cfg)
            qual, rot, width = decode_affordance_dense(
                p["decoder_aff"], feats, coords, n_blocks, shard_constraint=net_sharding
            )
            raw = (qual, rot, width)
            qual = mask_quality(qual, tsdf_process, width, planner_cfg)
            qual = bound_quality(qual, voxel_size, planner_cfg)
            cands = select_grasps(qual, rot, width, _lattice_positions(coords), planner_cfg)
            return cands, raw

    return jax.jit(plan, in_shardings=(repl, repl, repl), out_shardings=repl)


def build_vgn_planner_fn(net, planner_cfg: PlannerConfig, size: float,
                         precision: str = "default", dtype=None):
    """VGN dense path; widths/positions are in voxel units (reference detection.py).

    ``precision``/``dtype`` control the conv trunk only — postprocess
    (mask/bound/NMS/top-K) always runs fp32. The trunk default is the TPU's
    default (bf16-multiply, fp32-accumulate) matmul pass: measured round 4,
    the fp32-highest pin made the 6 convs + 3 dense k=5 heads cost 16.6 ms
    (6-pass emulation) vs 1.23 ms at default precision, with grasp decisions
    unchanged on synthetic scenes (tests/test_vgn_fast.py pins parity against
    the highest-precision plan). ``precision='highest'`` restores the exact
    reference-parity numerics; ``dtype=jnp.bfloat16`` casts params+input too.
    """
    voxel_size = size / 40.0
    cfg = planner_cfg
    # reference VGN width window is in voxel units (detection.py:116-118)
    import contextlib
    import dataclasses

    cfg = dataclasses.replace(cfg, min_width=1.33, max_width=9.33)

    from giga_tpu.models.vgn import fused_head_conv

    def plan(params, tsdf, tsdf_process):
        ctx = (jax.default_matmul_precision("highest")
               if precision == "highest" else contextlib.nullcontext())
        with ctx:
            p, tsdf_c = _maybe_cast(params, tsdf, dtype)
            x = net.apply(p, tsdf_c[None], method="trunk")
            # one 6-channel k=5 conv instead of three dense heads (exact;
            # ~3x cheaper — each separate 40^3 head costs ~0.9 ms on v5e)
            qual, rot, width = fused_head_conv(p["params"], x)
        qual, rot, width = (
            x[0].astype(jnp.float32) for x in (qual, rot, width)
        )
        raw = (qual, rot, width)
        qual = mask_quality(qual, tsdf_process, width, cfg)
        qual = bound_quality(qual, voxel_size, cfg)
        R = qual.shape[0]
        idx = jnp.arange(R, dtype=jnp.float32)
        positions = _lattice_positions(idx)  # voxel indices as float
        cands = select_grasps(qual, rot, width, positions, cfg)
        return cands, raw

    return jax.jit(plan)


def build_batched_vgn_planner_fn(net, planner_cfg: PlannerConfig, size: float,
                                 precision: str = "default", dtype=None):
    """Natively-batched VGN serving program: (params, (B, 40³) tsdf,
    (B, 40³) process) -> GraspCandidates with a leading batch axis.

    The conv trunk + fused 6-channel head batch on the leading axis (one
    conv program for the whole batch instead of B dispatches), and the
    postprocess runs the same batched stencils/top-K as GIGA serving
    (mask/bound broadcast over the batch; ``select_grasps_batched``).
    Per-scene semantics match ``build_vgn_planner_fn`` exactly — pinned by
    tests/test_vgn_fast.py::test_plan_batch_matches_single. Same reference
    contract as the single path (detection.py select(): voxel-unit widths
    and positions); the reference has no batched serving path.
    """
    import contextlib
    import dataclasses

    voxel_size = size / 40.0
    cfg = dataclasses.replace(planner_cfg, min_width=1.33, max_width=9.33)

    from giga_tpu.models.vgn import fused_head_conv

    def plan(params, tsdfs, tsdf_procs):
        ctx = (jax.default_matmul_precision("highest")
               if precision == "highest" else contextlib.nullcontext())
        with ctx:
            p, tsdfs_c = _maybe_cast(params, tsdfs, dtype)
            x = net.apply(p, tsdfs_c, method="trunk")
            qual, rot, width = fused_head_conv(p["params"], x)
        # thresholds/NMS/top-K run fp32; rot/width stay in the trunk dtype
        # until after the (B, K) top-k gather (exact widening commutes)
        q32 = qual.astype(jnp.float32)
        w32 = width.astype(jnp.float32)
        masked = mask_quality(q32, tsdf_procs, w32, cfg)
        masked = bound_quality(masked, voxel_size, cfg)
        R = masked.shape[-1]
        positions = _lattice_positions(jnp.arange(R, dtype=jnp.float32))
        return select_grasps_batched(masked, rot, w32, positions, cfg)

    return jax.jit(plan)


def _as_batch(grids) -> np.ndarray:
    """Normalize (B, R, R, R) / (B, 1, R, R, R) / single (R, R, R) inputs to
    a float32 (B, R, R, R) array (applied to tsdf AND process grids alike)."""
    a = np.asarray(grids, np.float32)
    return a.reshape(-1, *a.shape[-3:])


def _get_grids(state: State, resolution: int, default_size: float):
    """Extract (tsdf_grid, process_grid, voxel_size, size) from a State."""
    tsdf = state.tsdf
    if isinstance(tsdf, np.ndarray):
        grid = tsdf
        size = default_size
        voxel_size = size / resolution
        if state.tsdf_process is not None:
            tp = state.tsdf_process
            process_grid = tp if isinstance(tp, np.ndarray) else tp.get_grid()
        else:
            process_grid = grid
    else:
        grid = tsdf.get_grid()
        size = tsdf.size
        tsdf_process = state.tsdf_process if state.tsdf_process is not None else tsdf
        voxel_size = tsdf_process.voxel_size
        process_grid = tsdf_process.get_grid()
    return np.squeeze(grid), np.squeeze(process_grid), voxel_size, size


class GIGAPlanner:
    """VGNImplicit-equivalent host wrapper around the jitted pipeline.

    __call__(state) -> (grasps, scores, toc): grasps in metric workspace
    coordinates, ordered best-first when ``best`` else randomly permuted
    (reference: detection_implicit.py:62-76).
    """

    def __init__(
        self,
        model_path=None,
        model_type: str = "giga",
        best: bool = False,
        force_detection: bool = False,
        qual_th: float = 0.9,
        out_th: float = 0.5,
        low_th: float = 0.5,
        resolution: int = 40,
        size: float = 0.3,
        max_grasps: int = 128,
        net=None,
        model_cfg=None,
        params=None,
        rng: Optional[np.random.RandomState] = None,
        visualize: bool = False,
        precision: str = "fp32",  # 'fp32' | 'bf16' (bf16 trunk, fp32 postprocess)
        ensemble_combine: str = "mean",  # 'mean' | 'max' (K-member path only)
    ):
        if net is None:
            net, model_cfg, params = load_network(model_path, model_type)
        # commit params to device once: msgpack/device_get checkpoints are
        # host numpy, and passing those to a jitted fn re-ships them through
        # the (slow) host link on EVERY call (same as MeshGenerator)
        self.net, self.model_cfg = net, model_cfg
        # a list/tuple of param pytrees selects the K-member ensemble path
        # (leading stacked axis; see build_ensemble_giga_planner_fn)
        self.ensemble = isinstance(params, (list, tuple))
        if self.ensemble:
            params = stack_params(list(params))
        self.params = jax.device_put(params)
        self.planner_cfg = PlannerConfig(
            resolution=resolution,
            qual_th=qual_th,
            out_th=out_th,
            low_th=low_th,
            force_detection=force_detection,
            best=best,
            max_grasps=max_grasps,
            # wider NMS when visualizing, like the reference
            # (detection_implicit.py:59 max_filter_size=8 if visualize)
            max_filter_size=8 if visualize else 4,
        )
        self.size = size
        self.rng = rng if rng is not None else np.random
        self.visualize = visualize
        self._dtype = jnp.bfloat16 if precision == "bf16" else None
        if self.ensemble:
            self._fn = build_ensemble_giga_planner_fn(
                net, model_cfg, self.planner_cfg, size, dtype=self._dtype,
                combine=ensemble_combine)
        else:
            self._fn = build_giga_planner_fn(
                net, model_cfg, self.planner_cfg, size, dtype=self._dtype)
        self._vfn = None  # lazily-built batched variant (plan_batch)

    def __call__(self, state: State, scene_mesh=None, aff_kwargs=None):
        grid, process_grid, _, size = _get_grids(state, self.planner_cfg.resolution, self.size)
        if abs(size - self.size) > 1e-9:
            # the jitted program bakes workspace-size-derived constants
            # (border margins, metric width window) from self.size at build
            # time; silently rescaling positions by a different state size
            # would make masking and coordinates disagree
            raise ValueError(
                f"state TSDF size {size} != planner size {self.size}; "
                f"construct GIGAPlanner(size={size}) for this workspace"
            )
        tic = time.time()
        cands, raw = self._fn(self.params, jnp.asarray(grid), jnp.asarray(process_grid))
        cands = jax.device_get(cands)
        toc = time.time() - tic
        grasps, scores = candidates_to_grasps(
            cands, scale=size, offset=0.5, width_scale=size, best=self.planner_cfg.best, rng=self.rng
        )
        if self.visualize:
            composed = _affordance_scene(raw, grasps, scores, scene_mesh, size,
                                         **(aff_kwargs or {}))
            return grasps, scores, toc, composed
        return grasps, scores, toc

    def plan_stream(self, tsdf_grids, process_grids=None):
        """Latency-hiding single-scene streaming over a sequence of scenes.

        Issues scene i's (async) device program before fetching scene i-1's
        candidates, so device execution and the result transfer of the
        previous scene overlap the next dispatch — double buffering through
        the dispatch queue. Every scene's result is host-fetched (honest
        accounting); outputs are identical to calling the planner per scene.

        Args:
            tsdf_grids: iterable of (R, R, R) or (1, R, R, R) grids.
        Returns:
            list of (grasps, scores) per scene, in input order.
        """
        pending = []  # (device candidates,) not yet fetched; depth <= 1
        out = []

        def drain():
            cands = jax.device_get(pending.pop(0))
            out.append(
                candidates_to_grasps(
                    cands, scale=self.size, offset=0.5, width_scale=self.size,
                    best=self.planner_cfg.best, rng=self.rng,
                )
            )

        for grid in tsdf_grids:
            g = jnp.asarray(np.asarray(grid, np.float32).reshape(
                np.asarray(grid).shape[-3:]))
            if process_grids is None:
                p = g
            else:
                pg = np.asarray(
                    process_grids[len(out) + len(pending)], np.float32)
                p = jnp.asarray(pg.reshape(pg.shape[-3:]))
            cands, _ = self._fn(self.params, g, p)
            pending.append(cands)
            if len(pending) > 1:
                drain()
        while pending:
            drain()
        return out

    def _ensure_batched_fn(self):
        """Build (once) the batched planner program shared by plan_batch and
        PlannerService — one place owns the batched-serving configuration."""
        if self._vfn is None:
            if self.ensemble:
                raise NotImplementedError(
                    "batched serving of a checkpoint ensemble is not wired "
                    "up; plan scene-by-scene or serve the single best "
                    "checkpoint (ensembles cost K-fold compute)")
            # the fused-trunk Pallas decode wins for batched serving on TPU
            # (865 vs 590 scenes/s fp32, 2505 vs 1278 bf16 at B=64 on v5e);
            # build_batched falls back to the XLA path off-TPU
            self._vfn = build_batched_giga_planner_fn(
                self.net, self.model_cfg, self.planner_cfg, self.size,
                dtype=self._dtype, use_pallas=True,
            )
        return self._vfn

    def plan_batch(self, tsdf_grids: np.ndarray, process_grids=None):
        """Serving-throughput path: plan a whole batch of scenes at once.

        Args:
            tsdf_grids: (B, R, R, R) float32.
        Returns:
            list of (grasps, scores) per scene. Natively batched program
            (leading batch axis through encode/decode/stencils/top-K);
            ~3,900 scenes/s at B=64 bf16 on one v5e chip, serial-chain
            measured (single-scene: ~700/s fp32, ~2,500/s bf16).
        """
        self._ensure_batched_fn()
        grids = jnp.asarray(_as_batch(tsdf_grids))
        proc = grids if process_grids is None else jnp.asarray(
            _as_batch(process_grids))
        cands_b, _ = self._vfn(self.params, grids, proc)
        cands_b = jax.device_get(cands_b)
        out = []
        for i in range(grids.shape[0]):
            cands = GraspCandidates(*(x[i] for x in cands_b))
            out.append(
                candidates_to_grasps(
                    cands, scale=self.size, offset=0.5, width_scale=self.size,
                    best=self.planner_cfg.best, rng=self.rng,
                )
            )
        return out


class VGNPlanner:
    """VGN-equivalent host wrapper (dense 3D CNN + same postprocessing)."""

    def __init__(
        self,
        model_path=None,
        model_type: str = "vgn",
        best: bool = False,
        force_detection: bool = False,
        qual_th: float = 0.9,
        out_th: float = 0.5,
        size: float = 0.3,
        max_grasps: int = 128,
        net=None,
        params=None,
        rng: Optional[np.random.RandomState] = None,
        visualize: bool = False,
        precision: str = "default",  # 'default' | 'highest' | 'bf16' (trunk)
    ):
        if net is None:
            net, _, params = load_network(model_path, model_type)
        self.net = net
        self.params = jax.device_put(params)  # see GIGAPlanner.__init__
        self.planner_cfg = PlannerConfig(
            qual_th=qual_th,
            out_th=out_th,
            force_detection=force_detection,
            best=best,
            max_grasps=max_grasps,
            # wider NMS when visualizing, like the reference
            # (detection.py:60 max_filter_size=8 if visualize)
            max_filter_size=8 if visualize else 4,
        )
        self.size = size
        self.rng = rng if rng is not None else np.random
        self.visualize = visualize
        self._precision = precision
        self._fn = build_vgn_planner_fn(
            net, self.planner_cfg, size,
            precision="highest" if precision == "highest" else "default",
            dtype=jnp.bfloat16 if precision == "bf16" else None,
        )
        self._vfn = None  # batched program, built on first plan_batch

    def __call__(self, state: State, scene_mesh=None, aff_kwargs=None):
        # reference VGN uses ONLY state.tsdf (detection.py:44-47): a hi-res
        # tsdf_process (attached by the experiment harness at
        # resolution != 40) must neither mask the 40^3 volumes (shape
        # mismatch) nor set the voxel scale
        grid, _, _, _ = _get_grids(state, 40, self.size)
        tsdf = state.tsdf
        voxel_size = (self.size / 40 if isinstance(tsdf, np.ndarray)
                      else tsdf.voxel_size)
        tic = time.time()
        cands, raw = self._fn(self.params, jnp.asarray(grid), jnp.asarray(grid))
        cands = jax.device_get(cands)
        toc = time.time() - tic
        grasps, scores = candidates_to_grasps(
            cands, scale=voxel_size, offset=0.0, width_scale=voxel_size,
            best=self.planner_cfg.best, rng=self.rng,
        )
        if self.visualize:
            composed = _affordance_scene(raw, grasps, scores, scene_mesh, self.size,
                                         **(aff_kwargs or {}))
            return grasps, scores, toc, composed
        return grasps, scores, toc

    def plan_batch(self, tsdf_grids: np.ndarray, process_grids=None):
        """Serving-throughput path: plan a whole batch of VGN scenes at once.

        Args:
            tsdf_grids: (B, 40, 40, 40) float32 (a single (40³) grid and
                (B, 1, 40³) layouts are normalized like the GIGA path).
        Returns:
            list of (grasps, scores) per scene — per-scene results equal
            the single-scene ``__call__`` (same program semantics, one
            batched dispatch instead of B).
        """
        if self._vfn is None:
            self._vfn = build_batched_vgn_planner_fn(
                self.net, self.planner_cfg, self.size,
                precision="highest" if self._precision == "highest" else "default",
                dtype=jnp.bfloat16 if self._precision == "bf16" else None,
            )
        grids = jnp.asarray(_as_batch(tsdf_grids))
        proc = grids if process_grids is None else jnp.asarray(
            _as_batch(process_grids))
        cands_b = jax.device_get(self._vfn(self.params, grids, proc))
        voxel_size = self.size / 40.0
        out = []
        for i in range(grids.shape[0]):
            cands = GraspCandidates(*(x[i] for x in cands_b))
            out.append(
                candidates_to_grasps(
                    cands, scale=voxel_size, offset=0.0,
                    width_scale=voxel_size,
                    best=self.planner_cfg.best, rng=self.rng,
                )
            )
        return out


def candidates_to_grasps(cands: GraspCandidates, scale, offset, width_scale, best, rng):
    """Top-K arrays -> ordered list of metric Grasp objects.

    GIGA: metric position = (pos + 0.5) * size (detection_implicit.py:72);
    VGN: metric position = voxel_index * voxel_size (detection.py:71).
    """
    count = int(cands.count)
    grasps, scores = [], []
    order = np.arange(count) if best else rng.permutation(count)
    for i in order:
        pos = (np.asarray(cands.positions[i], dtype=np.float64) + offset) * scale
        quat = np.asarray(cands.rotations[i], dtype=np.float64)
        width = float(cands.widths[i]) * width_scale
        grasps.append(Grasp(Transform(Rotation.from_quat(quat), pos), width))
        scores.append(float(cands.scores[i]))
    return grasps, np.asarray(scores)


def _affordance_scene(raw, grasps, scores, scene_mesh, size, **aff_kwargs):
    from giga_tpu.utils import visual

    qual, rot, width = (np.asarray(v) for v in raw)
    colored = visual.affordance_visual(
        qual, rot, scene_mesh, size, qual.shape[0], **aff_kwargs
    )
    scene = visual.compose_scene(colored, grasps, scores)
    return scene

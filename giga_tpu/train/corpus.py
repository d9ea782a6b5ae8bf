"""Device-resident synthetic grasp corpus: build, load, sample, augment.

TPU-native data pipeline for the synthetic training loop (the environment's
stand-in for the reference's dataset pipeline, scripts/generate_data_parallel
+ dataset_voxel.py). The key design point: the whole corpus (TSDF volumes,
occupancy samples, grasp labels) is committed to device HBM ONCE, and every
training step ships only integer selection indices — a few hundred bytes —
through the host->device link. Gather, class-balanced grasp selection, and
augmentation all run inside the jitted train step. On this host the TPU
tunnel moves ~30-46 MB/s, so the classic host-assembled batch (8 MB of TSDF
per step at B=32) would cost ~200 ms/step in transfer alone; index-driven
device assembly makes the step compute-bound.

Augmentation is the reference's z-rotation scheme (dataset_voxel.py:114-135)
restricted to exact k*90-degree rotations: the voxel lattice of
``mesh_to_tsdf`` is symmetric about the workspace center, so rot90 on the
(x, y) grid axes is an exact permutation (no resampling blur, unlike the
reference's order-0 affine_transform) and the matching point/quaternion
rotation is exact too. The reference's random height shift is omitted: these
synthetic scenes already vary object height, and a voxel-space translation
would need interpolation.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- building

def build_scene(rng, size: float, n_occ: int, n_grasps: int) -> dict:
    """One scene -> flat arrays (all normalized units, see synthetic_grasps)."""
    from giga_tpu.utils.synthetic import make_occ_samples, mesh_to_tsdf, random_scene
    from giga_tpu.utils.synthetic_grasps import (
        grasps_to_batch_arrays,
        sample_labeled_grasps,
    )

    mesh = random_scene(rng, size)
    tsdf = mesh_to_tsdf(mesh, size, 40, rng=rng)
    pts, occ = make_occ_samples(mesh, size, n_occ, rng)
    arrs = grasps_to_batch_arrays(sample_labeled_grasps(mesh, size, n_grasps, rng), size)
    n = len(arrs["label"])
    if n < n_grasps:  # pad by repetition so shards stack rectangular
        rep = rng.randint(0, n, n_grasps - n)
        arrs = {k: np.concatenate([v, v[rep]]) for k, v in arrs.items()}
    return {
        "tsdf": tsdf.astype(np.float32),
        "occ_pts": (pts / size - 0.5).astype(np.float32),
        "occ_lbl": occ.astype(np.float32),
        "grasp_pos": arrs["pos"],
        "grasp_rot": arrs["rotations"],
        "grasp_width": arrs["width"],
        "grasp_label": arrs["label"],
    }


def write_shard(path, scenes: list[dict]):
    np.savez_compressed(path, **{
        k: np.stack([s[k] for s in scenes]) for k in scenes[0]
    })


def load_corpus(root) -> dict:
    """Stack all corpus shards (data/corpus/shard_*.npz) into host arrays."""
    paths = sorted(Path(root).glob("shard_*.npz"))
    if not paths:
        raise FileNotFoundError(f"no corpus shards under {root}")
    shards = [dict(np.load(p)) for p in paths]
    return {k: np.concatenate([s[k] for s in shards]) for k in shards[0]}


# ------------------------------------------------------- device-side assembly

def _rotk_quat(k):
    """Quaternion (xyzw) of Rz(k * 90deg)."""
    half = k.astype(jnp.float32) * (jnp.pi / 4.0)
    z = jnp.zeros_like(half)
    return jnp.stack([z, z, jnp.sin(half), jnp.cos(half)], axis=-1)


def _quat_premul(qz, q):
    """Hamilton product qz * q in xyzw layout; broadcasts over leading dims."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    # qz has zero x/y components (pure z rotation) — specialized product
    zz, zw = qz[..., 2], qz[..., 3]
    return jnp.stack(
        [zw * x - zz * y, zw * y + zz * x, zw * z + zz * w, zw * w - zz * z],
        axis=-1,
    )


def _rot_points(p, k):
    """Rotate (..., 3) points (centered normalized coords) by Rz(k*90deg)."""
    c = jnp.asarray([1.0, 0.0, -1.0, 0.0], jnp.float32)[k]
    s = jnp.asarray([0.0, 1.0, 0.0, -1.0], jnp.float32)[k]
    x, y, z = jnp.moveaxis(p, -1, 0)
    return jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)


def _rot_volume(vol, k):
    """Exact rot90 of an (X, Y, Z) volume matching ``_rot_points``.

    For +90deg (x, y) -> (-y, x); on the symmetric voxel lattice this is the
    index permutation out[i, j] = in[j, N-1-i], i.e. np.rot90(axes=(0, 1)).
    """
    return jax.lax.switch(k, [
        lambda v: v,
        lambda v: jnp.rot90(v, 1, axes=(0, 1)),
        lambda v: jnp.rot90(v, 2, axes=(0, 1)),
        lambda v: jnp.rot90(v, 3, axes=(0, 1)),
    ], vol)


def assemble_batch(corpus: dict, sel: dict) -> dict:
    """Gather + augment a train batch on device from the resident corpus.

    sel: scene (B,) int32, grasp (B,) int32, occ (B, K) int32,
         rotk (B,) int32 in [0, 4).
    """
    scene, gi, occ_sel, rotk = sel["scene"], sel["grasp"], sel["occ"], sel["rotk"]
    tsdf = jax.vmap(_rot_volume)(corpus["tsdf"][scene], rotk)
    occ_pts = _rot_points(
        jnp.take_along_axis(corpus["occ_pts"][scene], occ_sel[..., None], axis=1),
        rotk[:, None],
    )
    occ_lbl = jnp.take_along_axis(corpus["occ_lbl"][scene], occ_sel, axis=1)
    pos = _rot_points(corpus["grasp_pos"][scene, gi], rotk)
    rot = _quat_premul(_rotk_quat(rotk)[:, None, :], corpus["grasp_rot"][scene, gi])
    return {
        "tsdf": tsdf,
        "pos": pos,
        "rotations": rot,
        "width": corpus["grasp_width"][scene, gi],
        "label": corpus["grasp_label"][scene, gi],
        "pos_occ": occ_pts,
        "occ": occ_lbl,
    }


class CorpusSampler:
    """Host-side index sampler: class-balanced grasp choice per scene.

    Mirrors the reference's clean_balance_data step (positives ~= negatives)
    without materializing a rebalanced dataset: per draw, flip a fair coin
    for the target label and sample uniformly from that scene's matching
    grasp pool (falling back to any grasp when a scene lacks the class).
    """

    def __init__(self, corpus: dict, train_scenes, batch: int, occ_sub: int,
                 seed: int = 0, augment: bool = True):
        self.rng = np.random.RandomState(seed)
        self.train_scenes = np.asarray(train_scenes)
        self.batch, self.occ_sub, self.augment = batch, occ_sub, augment
        self.n_occ = corpus["occ_pts"].shape[1]
        lbl = corpus["grasp_label"]
        self.pools = []
        for s in range(lbl.shape[0]):
            pos = np.nonzero(lbl[s] == 1.0)[0]
            neg = np.nonzero(lbl[s] == 0.0)[0]
            any_ = np.arange(lbl.shape[1])
            self.pools.append((pos if len(pos) else any_, neg if len(neg) else any_))

    def __call__(self) -> dict:
        r = self.rng
        scene = self.train_scenes[r.randint(0, len(self.train_scenes), self.batch)]
        grasp = np.empty(self.batch, np.int32)
        for i, s in enumerate(scene):
            pool = self.pools[s][0 if r.rand() < 0.5 else 1]
            grasp[i] = pool[r.randint(len(pool))]
        return {
            "scene": scene.astype(np.int32),
            "grasp": grasp,
            "occ": r.randint(0, self.n_occ, (self.batch, self.occ_sub)).astype(np.int32),
            "rotk": (r.randint(0, 4, self.batch) if self.augment
                     else np.zeros(self.batch)).astype(np.int32),
        }


def device_corpus(corpus: dict, drop: tuple = ()) -> dict:
    """Commit the training arrays to device once (see module docstring)."""
    return {k: jax.device_put(jnp.asarray(v)) for k, v in corpus.items()
            if k not in drop}

"""Device-resident corpus pipeline: augmentation exactness + train step.

The k*90-degree z-rotation augmentation must be EXACT: rot90 on the volume,
the matching rotation on points, and the quaternion premultiply must all
describe the same rigid transform, so a trilinear sample of the rotated
volume at rotated points equals the original sample at original points.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from giga_tpu.train.corpus import (
    CorpusSampler,
    _quat_premul,
    _rot_points,
    _rot_volume,
    _rotk_quat,
    assemble_batch,
    build_scene,
    device_corpus,
    load_corpus,
    write_shard,
)


def _trilinear(vol, pts_norm):
    """Sample an (R,R,R) volume at centered-normalized points; voxel centers
    of mesh_to_tsdf sit at (i + 0.5)/R - 0.5."""
    from scipy.ndimage import map_coordinates

    R = vol.shape[0]
    idx = (np.asarray(pts_norm) + 0.5) * R - 0.5
    return map_coordinates(np.asarray(vol), idx.T, order=1, mode="nearest")


@pytest.fixture(scope="module")
def scene():
    return build_scene(np.random.RandomState(7), 0.3, 512, 24)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_rot_volume_matches_rot_points(scene, k):
    vol = scene["tsdf"]
    pts = scene["occ_pts"][:64]
    before = _trilinear(vol, pts)
    vol_r = np.asarray(_rot_volume(jnp.asarray(vol), k))
    pts_r = np.asarray(_rot_points(jnp.asarray(pts), jnp.int32(k)))
    after = _trilinear(vol_r, pts_r)
    np.testing.assert_allclose(after, before, atol=1e-5)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_quat_premul_matches_scipy(k):
    from giga_tpu.core.transform import Rotation

    rng = np.random.RandomState(k)
    q = Rotation.from_rotvec(rng.randn(5, 3)).as_quat().astype(np.float32)
    Rz = Rotation.from_rotvec([0.0, 0.0, np.pi / 2 * k])
    want = np.stack([(Rz * Rotation.from_quat(qi)).as_quat() for qi in q])
    got = np.asarray(_quat_premul(_rotk_quat(jnp.int32(k)), jnp.asarray(q)))
    # quaternion double cover: q and -q are the same rotation
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-5)


def test_rotated_grasp_pose_consistent(scene):
    """Rotating (pos, quat) must equal transforming the grasp pose by Rz."""
    from giga_tpu.core.transform import Rotation

    k = 1
    pos = scene["grasp_pos"][:8]
    quat = scene["grasp_rot"][:8, 0]  # first symmetric quat per grasp, (8, 4)
    Rz = Rotation.from_rotvec([0.0, 0.0, np.pi / 2 * k])
    want_pos = pos @ np.asarray(Rz.as_matrix()).T
    got_pos = np.asarray(_rot_points(jnp.asarray(pos), jnp.int32(k)))
    np.testing.assert_allclose(got_pos, want_pos.astype(np.float32), atol=1e-6)
    got_q = np.asarray(_quat_premul(_rotk_quat(jnp.int32(k)), jnp.asarray(quat)))
    want_q = np.stack([(Rz * Rotation.from_quat(qi)).as_quat() for qi in quat])
    sign = np.sign(np.sum(got_q * want_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(got_q * sign, want_q, atol=1e-5)


def test_corpus_roundtrip_and_assemble(tmp_path):
    scenes = [build_scene(np.random.RandomState(i), 0.3, 128, 12) for i in range(3)]
    write_shard(tmp_path / "shard_000.npz", scenes[:2])
    write_shard(tmp_path / "shard_001.npz", scenes[2:])
    corpus = load_corpus(tmp_path)
    assert corpus["tsdf"].shape == (3, 40, 40, 40)
    assert corpus["grasp_rot"].shape == (3, 12, 2, 4)

    dev = device_corpus(corpus)
    sel = {
        "scene": jnp.asarray([2, 0], jnp.int32),
        "grasp": jnp.asarray([5, 1], jnp.int32),
        "occ": jnp.asarray([[3, 7, 100], [0, 1, 2]], jnp.int32),
        "rotk": jnp.asarray([0, 0], jnp.int32),
    }
    batch = jax.device_get(assemble_batch(dev, sel))
    np.testing.assert_array_equal(batch["tsdf"][0], scenes[2]["tsdf"])
    np.testing.assert_allclose(batch["pos"][1], scenes[0]["grasp_pos"][1])
    np.testing.assert_allclose(batch["occ"][0], scenes[2]["occ_lbl"][[3, 7, 100]])
    np.testing.assert_allclose(
        batch["pos_occ"][1], scenes[0]["occ_pts"][[0, 1, 2]])
    assert batch["label"].shape == (2,)
    assert batch["rotations"].shape == (2, 2, 4)


def test_sampler_balances_classes():
    rng = np.random.RandomState(0)
    lbl = (rng.rand(4, 50) < 0.15).astype(np.float32)  # 15% positives raw
    corpus = {"occ_pts": np.zeros((4, 64, 3), np.float32), "grasp_label": lbl}
    sampler = CorpusSampler(corpus, [0, 1, 2, 3], batch=64, occ_sub=8, seed=1)
    fracs = []
    for _ in range(20):
        sel = sampler()
        fracs.append(lbl[sel["scene"], sel["grasp"]].mean())
        assert sel["occ"].shape == (64, 8)
        assert set(np.unique(sel["rotk"])) <= {0, 1, 2, 3}
    assert 0.4 < np.mean(fracs) < 0.6  # balanced despite the 15% base rate


def test_corpus_train_step_runs_and_learns():
    from giga_tpu.models.registry import get_network
    from giga_tpu.train.trainer import create_train_state, make_train_step

    scenes = [build_scene(np.random.RandomState(i), 0.3, 256, 16) for i in range(2)]
    corpus_np = {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}
    net, cfg = get_network("giga")
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), lr=1e-3)
    step = make_train_step(net, cfg, assemble=assemble_batch)
    dev = device_corpus(corpus_np)
    sampler = CorpusSampler(corpus_np, [0, 1], batch=8, occ_sub=64, seed=0)
    losses = []
    for _ in range(12):
        sel = {k: jnp.asarray(v) for k, v in sampler().items()}
        state, terms = step(state, dev, sel)
        losses.append(float(terms["loss_all"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])

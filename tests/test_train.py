"""Training stack tests: loss golden vs torch formulas, synthetic-dataset
pipeline, single-device and 8-device-mesh train steps."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from giga_tpu.core import io
from giga_tpu.core.grasp import Grasp, Label
from giga_tpu.core.perception import CameraIntrinsic
from giga_tpu.core.transform import Rotation, Transform
from giga_tpu.models.registry import get_network
from giga_tpu.train import loss as L
from giga_tpu.train.data import create_train_val_loaders
from giga_tpu.train.trainer import create_train_state, make_eval_step, make_train_step


class TestLossGolden:
    def test_composite_matches_torch(self):
        rng = np.random.RandomState(0)
        B, N = 8, 16
        qual = rng.uniform(0.01, 0.99, B).astype(np.float32)
        label = rng.randint(0, 2, B).astype(np.float32)
        rot_pred = rng.randn(B, 4).astype(np.float32)
        rot_pred /= np.linalg.norm(rot_pred, axis=1, keepdims=True)
        rotations = rng.randn(B, 2, 4).astype(np.float32)
        rotations /= np.linalg.norm(rotations, axis=2, keepdims=True)
        width_pred = rng.rand(B).astype(np.float32)
        width = rng.rand(B).astype(np.float32)
        occ_logits = rng.randn(B, N).astype(np.float32)
        occ = rng.randint(0, 2, (B, N)).astype(np.float32)

        # torch reference formulas (train_giga.py:161-195)
        tq = F.binary_cross_entropy(torch.tensor(qual), torch.tensor(label), reduction="none")
        l0 = 1.0 - torch.abs(torch.sum(torch.tensor(rot_pred) * torch.tensor(rotations[:, 0]), dim=1))
        l1 = 1.0 - torch.abs(torch.sum(torch.tensor(rot_pred) * torch.tensor(rotations[:, 1]), dim=1))
        tr = torch.min(l0, l1)
        tw = F.mse_loss(40 * torch.tensor(width_pred), 40 * torch.tensor(width), reduction="none")
        to = F.binary_cross_entropy(torch.sigmoid(torch.tensor(occ_logits)), torch.tensor(occ), reduction="none").mean(-1)
        t_loss = (tq + torch.tensor(label) * (tr + 0.01 * tw) + to).mean()

        outputs = {
            "qual": jnp.asarray(qual),
            "rot": jnp.asarray(rot_pred),
            "width": jnp.asarray(width_pred),
            "occ": jnp.asarray(occ_logits),
        }
        batch = {
            "label": jnp.asarray(label),
            "rotations": jnp.asarray(rotations),
            "width": jnp.asarray(width),
            "occ": jnp.asarray(occ),
        }
        loss, terms = L.giga_loss(outputs, batch)
        assert float(loss) == pytest.approx(float(t_loss), abs=5e-5)
        assert float(terms["loss_rot"]) == pytest.approx(float(tr.mean()), abs=1e-6)
        assert float(terms["loss_occ"]) == pytest.approx(float(to.mean()), abs=1e-5)


def make_synthetic_dataset(root, raw_root, n_scenes=3, n_grasps=12, seed=0):
    rng = np.random.RandomState(seed)
    (root / "scenes").mkdir(parents=True)
    (raw_root / "occ").mkdir(parents=True)
    intrinsic = CameraIntrinsic(640, 480, 540.0, 540.0, 320.0, 240.0)
    io.write_setup(raw_root, 0.3, intrinsic, 0.08, 0.05)
    scene_ids = [f"scene{i}" for i in range(n_scenes)]
    for sid in scene_ids:
        io.write_voxel_grid(root, sid, rng.rand(1, 40, 40, 40).astype(np.float32))
        (raw_root / "occ" / sid).mkdir()
        for shard in range(2):
            pts = rng.uniform(0, 0.3, (64, 3)).astype(np.float16)
            occ = rng.rand(64) > 0.5
            np.savez(raw_root / "occ" / sid / f"{shard:04d}.npz", points=pts, occ=occ)
    for i in range(n_grasps):
        g = Grasp(
            Transform(Rotation.random(random_state=rng), rng.uniform(0.05, 0.25, 3)),
            rng.uniform(0.0, 0.08),
        )
        io.write_grasp(raw_root, scene_ids[i % n_scenes], g, Label(i % 2))


class TestDataPipeline:
    def test_loader_shapes(self, tmp_path):
        root, raw = tmp_path / "proc", tmp_path / "raw"
        make_synthetic_dataset(root, raw)
        train_loader, val_loader = create_train_val_loaders(
            root, raw, batch_size=4, val_split=0.25, augment=True, num_point_occ=32
        )
        batch = next(iter(train_loader))
        assert batch["tsdf"].shape == (4, 40, 40, 40)
        assert batch["pos"].shape == (4, 3)
        assert np.all(np.abs(batch["pos"]) <= 0.5)
        assert batch["rotations"].shape == (4, 2, 4)
        assert batch["pos_occ"].shape == (4, 32, 3)
        assert batch["occ"].shape == (4, 32)
        assert len(train_loader) == 9 // 4 and len(val_loader) == 3 // 4


class TestPrefetchLoader:
    def test_same_batches_as_sync_loader(self, tmp_path):
        from giga_tpu.train.data import PrefetchLoader

        root, raw = tmp_path / "proc", tmp_path / "raw"
        make_synthetic_dataset(root, raw)
        # load_occ=False keeps __getitem__ deterministic (occ shard choice
        # consumes the dataset rng), so the two epochs are comparable
        train_loader, _ = create_train_val_loaders(
            root, raw, batch_size=4, val_split=0.25, augment=False, load_occ=False
        )
        # deterministic comparison: unshuffled loader
        train_loader.shuffle = False
        sync = list(train_loader)
        pre = list(PrefetchLoader(train_loader, num_workers=3, prefetch=2))
        assert len(pre) == len(sync)
        for a, b in zip(sync, pre):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


class TestTrainStep:
    @pytest.mark.parametrize("name", ["giga", "giga_geo"])
    def test_single_device_step_reduces_loss(self, tmp_path, name):
        net, cfg = get_network(name)
        state = create_train_state(net, cfg, jax.random.PRNGKey(0))
        step = make_train_step(net, cfg)
        rng = np.random.RandomState(0)
        B, N = 4, 16
        batch = {
            "tsdf": jnp.asarray(rng.rand(B, 40, 40, 40), jnp.float32),
            "pos": jnp.asarray(rng.uniform(-0.4, 0.4, (B, 3)), jnp.float32),
            "label": jnp.asarray(rng.randint(0, 2, B), jnp.float32),
            "rotations": jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
            "width": jnp.asarray(rng.rand(B), jnp.float32),
            "pos_occ": jnp.asarray(rng.uniform(-0.4, 0.4, (B, N, 3)), jnp.float32),
            "occ": jnp.asarray(rng.randint(0, 2, (B, N)), jnp.float32),
        }
        losses = []
        for _ in range(3):
            state, terms = step(state, batch)
            losses.append(float(terms["loss_all"]))
        assert losses[-1] < losses[0]

    def test_mm_sampler_step_matches_gather(self):
        """make_train_step's default sampler='mm' (gather-free MXU plane
        sampling for the arbitrary-point training queries; 2.16x on v5e)
        must reproduce the exact-gather step: the fp32 step pins HIGHEST
        matmuls, where mm == gather to ~1e-6 (test_ops), so losses and the
        updated params agree to fp32 tolerance."""
        net, cfg = get_network("giga")
        rng = np.random.RandomState(3)
        B, N = 4, 16
        batch = {
            "tsdf": jnp.asarray(rng.rand(B, 40, 40, 40), jnp.float32),
            "pos": jnp.asarray(rng.uniform(-0.4, 0.4, (B, 3)), jnp.float32),
            "label": jnp.asarray(rng.randint(0, 2, B), jnp.float32),
            "rotations": jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
            "width": jnp.asarray(rng.rand(B), jnp.float32),
            "pos_occ": jnp.asarray(rng.uniform(-0.4, 0.4, (B, N, 3)), jnp.float32),
            "occ": jnp.asarray(rng.randint(0, 2, (B, N)), jnp.float32),
        }
        state_mm = create_train_state(net, cfg, jax.random.PRNGKey(0))
        state_g = create_train_state(net, cfg, jax.random.PRNGKey(0))
        step_mm = make_train_step(net, cfg)  # default sampler='mm'
        step_g = make_train_step(net, cfg, sampler=None)  # cfg's 'gather'

        s_mm, t_mm = step_mm(state_mm, batch)
        s_g, t_g = step_g(state_g, batch)
        assert float(t_mm["loss_all"]) == pytest.approx(
            float(t_g["loss_all"]), abs=1e-5)
        for a, b in zip(jax.tree.leaves(s_mm.params),
                        jax.tree.leaves(s_g.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_bf16_mixed_precision_step(self):
        """dtype=bf16 step: fp32 master params, bf16 compute; loss still
        decreases and the first-step gradients track the fp32 step."""
        net, cfg = get_network("giga")
        rng = np.random.RandomState(0)
        B, N = 4, 16
        batch = {
            "tsdf": jnp.asarray(rng.rand(B, 40, 40, 40), jnp.float32),
            "pos": jnp.asarray(rng.uniform(-0.4, 0.4, (B, 3)), jnp.float32),
            "label": jnp.asarray(rng.randint(0, 2, B), jnp.float32),
            "rotations": jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
            "width": jnp.asarray(rng.rand(B), jnp.float32),
            "pos_occ": jnp.asarray(rng.uniform(-0.4, 0.4, (B, N, 3)), jnp.float32),
            "occ": jnp.asarray(rng.randint(0, 2, (B, N)), jnp.float32),
        }
        state16 = create_train_state(net, cfg, jax.random.PRNGKey(0))
        state32 = create_train_state(net, cfg, jax.random.PRNGKey(0))
        step16 = make_train_step(net, cfg, dtype=jnp.bfloat16)
        step32 = make_train_step(net, cfg)

        s32, t32 = step32(state32, batch)
        s16, t16 = step16(state16, batch)
        # same objective to bf16 resolution
        assert abs(float(t16["loss_all"]) - float(t32["loss_all"])) < 3e-2
        # master params stay fp32
        leaves = jax.tree.leaves(s16.params)
        assert all(leaf.dtype == jnp.float32 for leaf in leaves)

        losses = []
        for _ in range(3):
            s16, t = step16(s16, batch)
            losses.append(float(t["loss_all"]))
        assert np.isfinite(losses).all() and losses[-1] < losses[0]

    def test_mesh_train_step_8_devices(self):
        from giga_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
        mesh = make_mesh(8)
        net, cfg = get_network("giga")
        state = create_train_state(net, cfg, jax.random.PRNGKey(0))
        state = replicate(mesh, state)
        step = make_train_step(net, cfg, mesh=mesh)
        eval_step = make_eval_step(net, cfg, mesh=mesh)
        rng = np.random.RandomState(1)
        B, N = 8, 8
        batch = {
            "tsdf": rng.rand(B, 40, 40, 40).astype(np.float32),
            "pos": rng.uniform(-0.4, 0.4, (B, 3)).astype(np.float32),
            "label": rng.randint(0, 2, B).astype(np.float32),
            "rotations": rng.randn(B, 2, 4).astype(np.float32),
            "width": rng.rand(B).astype(np.float32),
            "pos_occ": rng.uniform(-0.4, 0.4, (B, N, 3)).astype(np.float32),
            "occ": rng.randint(0, 2, (B, N)).astype(np.float32),
        }
        sb = shard_batch(mesh, batch)
        state2, terms = step(state, sb)
        metrics = eval_step(state2.params, sb)
        assert np.isfinite(float(terms["loss_all"]))
        assert np.isfinite(float(metrics["loss_all"]))

        # sharded step must equal the single-device step numerically
        net1, cfg1 = get_network("giga")
        state1 = create_train_state(net1, cfg1, jax.random.PRNGKey(0))
        step1 = make_train_step(net1, cfg1)
        _, terms1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, batch))
        assert float(terms["loss_all"]) == pytest.approx(float(terms1["loss_all"]), rel=1e-5)


class TestNonFiniteGuard:
    def test_skip_nonfinite_step_preserves_params(self):
        """With skip_nonfinite, a batch that produces inf/NaN gradients must
        leave the params untouched (clipping alone turns inf into NaN via
        0 * inf in the clip scale), and training must resume on the next
        finite batch."""
        net, cfg = get_network("giga")
        state = create_train_state(net, cfg, jax.random.PRNGKey(0),
                                   clip_norm=1.0, skip_nonfinite=True)
        step = make_train_step(net, cfg)
        rng = np.random.RandomState(0)
        B, N = 2, 16
        batch = {
            "tsdf": jnp.asarray(rng.rand(B, 40, 40, 40), jnp.float32),
            "pos": jnp.asarray(rng.uniform(-0.4, 0.4, (B, 3)), jnp.float32),
            "label": jnp.asarray(rng.randint(0, 2, B), jnp.float32),
            "rotations": jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
            "width": jnp.asarray(rng.rand(B), jnp.float32),
            "pos_occ": jnp.asarray(rng.uniform(-0.4, 0.4, (B, N, 3)), jnp.float32),
            "occ": jnp.asarray(rng.randint(0, 2, (B, N)), jnp.float32),
        }
        state, terms = step(state, batch)
        assert np.isfinite(float(terms["loss_all"]))
        # snapshot BEFORE the poisoned step: the step donates its input state
        snap = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]

        bad = dict(batch, tsdf=batch["tsdf"].at[0, 0, 0, 0].set(jnp.nan))
        state, terms_bad = step(state, bad)
        assert not np.isfinite(float(terms_bad["loss_all"]))
        for a, b in zip(snap, jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(a, np.asarray(b))

        state, terms2 = step(state, batch)
        assert np.isfinite(float(terms2["loss_all"]))

"""End-to-end Trainer loop on a synthetic on-disk dataset, incl. orbax resume."""

import numpy as np

import jax

from giga_tpu.core.config import TrainConfig
from giga_tpu.models.registry import get_network, load_params
from giga_tpu.train.data import create_train_val_loaders
from giga_tpu.train.trainer import Trainer, create_train_state

from tests.test_train import make_synthetic_dataset


def test_trainer_fit_checkpoints_and_resumes(tmp_path):
    root, raw = tmp_path / "proc", tmp_path / "raw"
    make_synthetic_dataset(root, raw, n_scenes=2, n_grasps=8)
    train_loader, val_loader = create_train_val_loaders(
        root, raw, batch_size=4, val_split=0.25, augment=False, num_point_occ=16
    )
    net, cfg = get_network("giga_aff")
    state = create_train_state(net, cfg, jax.random.PRNGKey(0))
    logdir = tmp_path / "run"
    trainer = Trainer(net, cfg, TrainConfig(net="giga_aff"), logdir=logdir, use_orbax=True)
    state, history = trainer.fit(state, train_loader, val_loader, epochs=2, log=lambda *_: None)
    assert len(history) == 2
    assert (logdir / "giga_aff_last.msgpack").exists()
    assert (logdir / "giga_aff_best.msgpack").exists()
    assert (logdir / "history.jsonl").exists()
    params = load_params(logdir / "giga_aff_last.msgpack")
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        jax.tree_util.tree_leaves(params)[0],
    )
    trainer.ckpt_mgr.close()

    # a fresh trainer resumes at epoch 3 and runs only the remaining epoch;
    # history (returned AND in history.jsonl) keeps the pre-resume epochs
    # instead of truncating the curve to post-resume rows
    trainer2 = Trainer(net, cfg, TrainConfig(net="giga_aff"), logdir=logdir, use_orbax=True)
    fresh = create_train_state(net, cfg, jax.random.PRNGKey(42))
    state2, history2 = trainer2.fit(fresh, train_loader, val_loader, epochs=3, log=lambda *_: None)
    assert trainer2.start_epoch == 3
    assert [row["epoch"] for row in history2] == [1, 2, 3]
    import json

    rows = [json.loads(l) for l in (logdir / "history.jsonl").open()]
    assert [row["epoch"] for row in rows] == [1, 2, 3]
    trainer2.ckpt_mgr.close()


def test_trainer_bf16(tmp_path):
    """Trainer(dtype=bf16) fits end-to-end with fp32 checkpoints."""
    import jax.numpy as jnp

    root, raw = tmp_path / "proc", tmp_path / "raw"
    make_synthetic_dataset(root, raw, n_scenes=2, n_grasps=8)
    train_loader, val_loader = create_train_val_loaders(
        root, raw, batch_size=4, val_split=0.25, augment=False, num_point_occ=16
    )
    net, cfg = get_network("giga_aff")
    state = create_train_state(net, cfg, jax.random.PRNGKey(0))
    trainer = Trainer(net, cfg, TrainConfig(net="giga_aff"),
                      logdir=tmp_path / "run16", dtype=jnp.bfloat16)
    state, history = trainer.fit(state, train_loader, val_loader, epochs=1,
                                 log=lambda *_: None)
    assert np.isfinite(history[0]["train"]["loss_all"])
    params = load_params(tmp_path / "run16" / "giga_aff_last.msgpack")
    assert all(
        leaf.dtype == np.float32 for leaf in jax.tree_util.tree_leaves(params)
    )

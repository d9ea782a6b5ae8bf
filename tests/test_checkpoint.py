"""Checkpoint + profiling subsystem tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestOrbaxCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from giga_tpu.core.config import giga_aff
        from giga_tpu.models.registry import get_network
        from giga_tpu.train.checkpoint import CheckpointManager
        from giga_tpu.train.trainer import create_train_state

        net, cfg = get_network("giga_aff")
        state = create_train_state(net, cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save(1, state, {"accuracy": 0.5})
        mgr.save(2, state, {"accuracy": 0.7})
        assert mgr.latest_epoch() == 2

        state2 = create_train_state(net, cfg, jax.random.PRNGKey(1))
        restored, metrics, epoch = mgr.restore(state2)
        assert epoch == 2 and metrics["accuracy"] == pytest.approx(0.7)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mgr.close()

    def test_msgpack_params_roundtrip(self, tmp_path):
        from giga_tpu.models.registry import get_network, load_params, save_params
        from giga_tpu.train.trainer import create_train_state

        net, cfg = get_network("giga_aff")
        state = create_train_state(net, cfg, jax.random.PRNGKey(0))
        save_params(state.params, tmp_path / "p.msgpack")
        params2 = load_params(tmp_path / "p.msgpack")
        for x, y in zip(
            jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(params2)
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestProfiling:
    def test_timer_sections(self):
        from giga_tpu.utils.profiling import Timer

        t = Timer()
        for _ in range(3):
            with t.section("work"):
                pass
        s = t.summary()
        assert s["work"]["count"] == 3
        assert "work" in t.report()

    def test_global_stage(self):
        from giga_tpu.utils.profiling import GLOBAL_TIMER, stage

        GLOBAL_TIMER.reset()
        with stage("x"):
            pass
        assert GLOBAL_TIMER.summary()["x"]["count"] == 1

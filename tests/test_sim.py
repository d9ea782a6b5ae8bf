"""Sim-layer tests that run without pybullet: noise models, import gating,
VGN training path, synthetic clutter-removal-logger round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from giga_tpu.models.registry import get_network
from giga_tpu.sim.noise import apply_noise, set_random_seed
from giga_tpu.train.trainer import create_train_state, make_train_step


class TestNoise:
    def test_identity_without_type(self):
        img = np.ones((48, 64), np.float32)
        np.testing.assert_array_equal(apply_noise(img.copy(), ""), img)
        np.testing.assert_array_equal(apply_noise(img.copy(), False), img)

    @pytest.mark.parametrize("kind", ["dex", "trans", "norm"])
    def test_noise_statistics(self, kind):
        set_random_seed(0)
        img = np.full((120, 160), 0.8, np.float32)
        out = apply_noise(img.copy(), kind)
        assert out.shape == img.shape
        # noise should be small relative to the signal
        assert abs(out.mean() - 0.8) < 0.1
        assert out.std() < 0.1
        assert not np.array_equal(out, img)

    def test_dex_gp_noise_is_smooth(self):
        # the GP component is low-frequency: neighboring pixels correlate
        set_random_seed(1)
        img = np.zeros((120, 160), np.float32)
        outs = [apply_noise(img.copy(), "dex") for _ in range(8)]
        out = next(o for o in outs if o.std() > 0)  # one with GP applied
        dx = np.abs(np.diff(out, axis=1)).mean()
        assert dx < out.std()  # smoother than white noise


class TestPybulletGating:
    def test_sim_import_without_pybullet(self):
        from giga_tpu.sim import btsim

        if btsim.PYBULLET_AVAILABLE:
            pytest.skip("pybullet installed")
        with pytest.raises(ImportError, match="pybullet"):
            btsim.BtWorld(gui=False)


class TestVGNTraining:
    def test_vgn_train_step(self):
        net, cfg = get_network("vgn")
        state = create_train_state(net, cfg, jax.random.PRNGKey(0))
        step = make_train_step(net, cfg)
        rng = np.random.RandomState(0)
        B = 2
        batch = {
            "tsdf": jnp.asarray(rng.rand(B, 40, 40, 40), jnp.float32),
            "index": jnp.asarray(rng.randint(0, 40, (B, 3)), jnp.int32),
            "label": jnp.asarray(rng.randint(0, 2, B), jnp.float32),
            "rotations": jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
            "width": jnp.asarray(rng.rand(B) * 10, jnp.float32),
        }
        losses = []
        for _ in range(3):
            state, terms = step(state, batch)
            losses.append(float(terms["loss_all"]))
        assert losses[-1] < losses[0]


class TestLoggerRoundTrip:
    def test_logger_and_data(self, tmp_path):
        from giga_tpu.core.grasp import Grasp, Label
        from giga_tpu.core.transform import Rotation, Transform
        from giga_tpu.experiments.clutter_removal import Data, Logger
        from giga_tpu.inference.planner import State

        class FakeTSDF:
            def get_grid(self):
                return np.zeros((1, 4, 4, 4), np.float32)

        logger = Logger(tmp_path, "test")
        logger.log_round(0, 5)
        state = State(tsdf=FakeTSDF(), pc=np.zeros((10, 3)))
        g = Grasp(Transform(Rotation.identity(), [0.1, 0.1, 0.1]), 0.04)
        logger.log_grasp(0, state, 0.1, 0.01, g, 0.95, Label.SUCCESS)
        logger.log_grasp(0, state, 0.1, 0.02, g, 0.5, Label.FAILURE)

        data = Data(logger.logdir)
        assert data.num_rounds() == 1
        assert data.num_grasps() == 2
        assert data.success_rate() == pytest.approx(50.0)
        assert data.percent_cleared() == pytest.approx(20.0)
        points, grasp, score, label = data.read_grasp(0)
        assert score == pytest.approx(0.95)
        assert label == 1

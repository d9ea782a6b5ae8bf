"""giga_wide preset: the 2x-width model-scaling variant (core/config.py
giga_wide). Pins that the generic model/training paths are truly
width-agnostic — the reference expresses this via conv_onet/config.py c_dim
+ decoder_kwargs but ships no such preset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from giga_tpu.core.config import get_config
from giga_tpu.models.registry import get_network


@pytest.fixture(scope="module")
def wide():
    net, cfg = get_network("giga_wide")
    tsdf = jnp.zeros((1, 40, 40, 40))
    p = jnp.zeros((1, 8, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf, p, p)
    return net, cfg, params


def test_preset_registered_and_wider():
    cfg = get_config("giga_wide")
    assert cfg.encoder.c_dim == 64
    assert cfg.decoder.hidden_size == 64
    base = get_config("giga")
    assert cfg.decoder.n_blocks == base.decoder.n_blocks  # depth unchanged


def test_forward_shapes(wide):
    net, cfg, params = wide
    rng = np.random.RandomState(0)
    tsdf = jnp.asarray(rng.rand(1, 40, 40, 40), jnp.float32)
    p = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 8, 3)), jnp.float32)
    out = net.apply(params, tsdf, p, p)
    assert out["qual"].shape == (1, 8) and out["rot"].shape == (1, 8, 4)
    assert out["width"].shape == (1, 8) and out["occ"].shape == (1, 8)
    assert all(bool(jnp.isfinite(v).all()) for v in out.values())
    # rot head outputs unit quaternions
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["rot"]), axis=-1), 1.0, atol=1e-5)


def test_train_step_reduces_loss(wide):
    net, cfg, _ = wide
    from giga_tpu.train.trainer import create_train_state, make_train_step

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
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

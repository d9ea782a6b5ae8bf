"""Fused stem+pool Pallas kernel parity (interpreter mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from giga_tpu.models.registry import get_network
from giga_tpu.ops.pallas.stem_kernel import (
    can_encode_fused,
    encode_planes_fused,
)


def test_fused_encode_matches_module():
    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    rng = np.random.RandomState(0)
    grids = jnp.asarray(rng.rand(2, 40, 40, 40).astype(np.float32))
    assert can_encode_fused(cfg.encoder, grids.shape)

    ref = net.apply(params, grids, method="encode")
    got = encode_planes_fused(params["params"]["encoder"], grids, cfg.encoder,
                              interpret=True)
    assert set(ref) == set(got)
    for t in ref:
        np.testing.assert_allclose(
            np.asarray(ref[t]), np.asarray(got[t]), atol=2e-5,
        )


def test_can_encode_fused_gates():
    net, cfg = get_network("giga")
    assert not can_encode_fused(cfg.encoder, (2, 32, 32, 32))  # res mismatch

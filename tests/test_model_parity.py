"""End-to-end numerical parity: torch golden models -> converter -> flax models.

Validates, in one shot, the checkpoint converter's key mapping / weight
transposition AND every numeric choice in the JAX forward pass (conv
semantics, axis-mean triplane pooling, U-Net structure, grid_sample chain,
stacked decoder einsums, head activations) against torch's own kernels.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from giga_tpu.core.config import get_config
from giga_tpu.models.registry import get_network
from giga_tpu.models.torch_convert import convert_giga_state_dict, convert_vgn_state_dict

from tests.torch_golden import GoldenGIGA, GoldenVGN


@pytest.fixture(scope="module")
def giga_pair():
    torch.manual_seed(0)
    golden = GoldenGIGA().eval()
    net, cfg = get_network("giga")
    params = convert_giga_state_dict(golden.state_dict(), cfg)
    return golden, net, params


class TestGIGAParity:
    def test_forward_matches_torch(self, giga_pair):
        golden, net, params = giga_pair
        rng = np.random.RandomState(0)
        tsdf = rng.rand(2, 40, 40, 40).astype(np.float32)
        p = rng.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32)
        p_occ = rng.uniform(-0.5, 0.5, (2, 16, 3)).astype(np.float32)

        with torch.no_grad():
            gold = golden(torch.from_numpy(tsdf), torch.from_numpy(p), torch.from_numpy(p_occ))
        ours = net.apply(params, jnp.asarray(tsdf), jnp.asarray(p), jnp.asarray(p_occ))

        np.testing.assert_allclose(np.asarray(ours["qual"]), gold["qual"].numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours["rot"]), gold["rot"].numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours["width"]), gold["width"].numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours["occ"]), gold["occ"].numpy(), atol=2e-5)

    def test_encoder_planes_match(self, giga_pair):
        golden, net, params = giga_pair
        rng = np.random.RandomState(1)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        with torch.no_grad():
            gold_planes = golden.encoder(torch.from_numpy(tsdf))
        planes = net.apply(params, jnp.asarray(tsdf), method="encode")
        for t in ("xz", "xy", "yz"):
            ours = np.asarray(planes[t])[0].transpose(2, 0, 1)  # (C, H, W)
            np.testing.assert_allclose(ours, gold_planes[t][0].numpy(), atol=1e-5)


class TestGIGAAffParity:
    def test_aff_variant_conversion(self):
        """giga_aff checkpoints (no occupancy decoder) convert + match."""
        torch.manual_seed(3)
        golden = GoldenGIGA(with_tsdf=False).eval()
        net, cfg = get_network("giga_aff")
        params = convert_giga_state_dict(golden.state_dict(), cfg)
        rng = np.random.RandomState(4)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        p = rng.uniform(-0.5, 0.5, (1, 16, 3)).astype(np.float32)
        with torch.no_grad():
            gold = golden(torch.from_numpy(tsdf), torch.from_numpy(p))
        ours = net.apply(params, jnp.asarray(tsdf), jnp.asarray(p), None)
        np.testing.assert_allclose(np.asarray(ours["qual"]), gold["qual"].numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours["rot"]), gold["rot"].numpy(), atol=2e-5)


class TestVGNParity:
    def test_forward_matches_torch(self):
        torch.manual_seed(1)
        golden = GoldenVGN().eval()
        net, _ = get_network("vgn")
        params = convert_vgn_state_dict(golden.state_dict())
        rng = np.random.RandomState(2)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        with torch.no_grad():
            gq, gr, gw = golden(torch.from_numpy(tsdf))
        q, r, w = net.apply(params, jnp.asarray(tsdf))
        np.testing.assert_allclose(np.asarray(q), gq.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(r), gr.numpy().transpose(0, 2, 3, 4, 1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(w), gw.numpy(), atol=2e-5)


class TestVariants:
    @pytest.mark.parametrize("name", ["giga_aff", "giga_geo", "giga_detach", "giga_grid"])
    def test_variant_init_and_forward(self, name):
        import jax

        net, cfg = get_network(name)
        tsdf = jnp.zeros((1, 40, 40, 40))
        p = jnp.zeros((1, 4, 3))
        p_occ = jnp.zeros((1, 4, 3))
        args = (tsdf, None, p_occ) if cfg.tsdf_only else (tsdf, p, p_occ)
        params = net.init(jax.random.PRNGKey(0), *args)
        out = net.apply(params, *args)
        if cfg.tsdf_only:
            assert set(out) == {"occ"}
        elif not cfg.decoder_tsdf:
            assert set(out) == {"qual", "rot", "width"}
        else:
            assert set(out) == {"qual", "rot", "width", "occ"}

"""Loading a real torch .pt checkpoint file through the registry."""

import numpy as np
import torch

import jax.numpy as jnp

from giga_tpu.models.registry import infer_model_type, load_network

from tests.torch_golden import GoldenGIGA


def test_load_network_from_pt_file(tmp_path):
    torch.manual_seed(0)
    golden = GoldenGIGA().eval()
    # reference naming convention: {prefix}_{type}_... (networks.py:29)
    path = tmp_path / "best_giga_val.pt"
    torch.save(golden.state_dict(), path)
    assert infer_model_type(path) == "giga"

    net, cfg, params = load_network(path)  # type inferred from filename
    rng = np.random.RandomState(0)
    tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
    p = rng.uniform(-0.4, 0.4, (1, 8, 3)).astype(np.float32)
    out = net.apply(params, jnp.asarray(tsdf), jnp.asarray(p), jnp.asarray(p))
    with torch.no_grad():
        gold = golden(torch.from_numpy(tsdf), torch.from_numpy(p), torch.from_numpy(p))
    np.testing.assert_allclose(np.asarray(out["qual"]), gold["qual"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["occ"]), gold["occ"].numpy(), atol=2e-5)

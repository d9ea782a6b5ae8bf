"""Test configuration: force JAX onto CPU with 8 virtual devices.

Must run before jax is imported anywhere, so the env vars are set at conftest
import time. This is the standard JAX fake-backend trick for exercising
multi-device sharding (SURVEY.md section 4) without TPU hardware; numeric
golden tests also run faster on CPU than through TPU compile cycles.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # override even if the env preset axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# fp32 golden tests compare against torch/scipy; JAX's default matmul
# precision is bf16-like, so force full precision for numerics tests.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

SIM_URDF_ROOT = REPO_ROOT / "tests" / "fixtures" / "urdfs"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running e2e test (deselect with -m 'not slow' for the "
        "quick iteration loop; the full invariant suite still runs them)",
    )


@pytest.fixture
def fake_pb(monkeypatch):
    """Install tests/fake_pybullet as the pybullet module so the sim stack
    (btsim/simulation/clutter_removal/data-gen scripts) executes for real.

    Function-scoped with monkeypatch cleanup so the import-gating tests in
    test_sim.py still see an environment without pybullet."""
    import tests.fake_pybullet as fpb
    from giga_tpu.sim import btsim

    fpb.reset_module_state()
    monkeypatch.setitem(sys.modules, "pybullet", fpb)
    monkeypatch.setitem(sys.modules, "pybullet_utils", fpb.pybullet_utils)
    monkeypatch.setitem(sys.modules, "pybullet_utils.bullet_client", fpb.bullet_client)
    monkeypatch.setattr(btsim, "_pb", fpb)
    monkeypatch.setattr(btsim, "_bullet_client", fpb.bullet_client)
    monkeypatch.setattr(btsim, "PYBULLET_AVAILABLE", True)
    return fpb

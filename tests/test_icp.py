"""ICP alignment tests."""

import numpy as np

from giga_tpu.core.transform import Rotation
from giga_tpu.geometry.icp import best_fit_transform, icp


def test_best_fit_recovers_exact_transform():
    rng = np.random.RandomState(0)
    src = rng.randn(200, 3)
    R = Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix()
    t = np.array([0.5, -0.2, 1.0])
    dst = src @ R.T + t
    T, R2, t2 = best_fit_transform(src, dst)
    np.testing.assert_allclose(R2, R, atol=1e-10)
    np.testing.assert_allclose(t2, t, atol=1e-10)


def test_icp_converges_from_small_perturbation():
    rng = np.random.RandomState(1)
    dst = rng.rand(500, 3)
    R = Rotation.from_rotvec([0.02, 0.03, -0.02]).as_matrix()
    t = np.array([0.01, -0.02, 0.015])
    src = (dst - t) @ R  # inverse-ish perturbation
    T, err, iters = icp(src, dst)
    assert err < 1e-3
    aligned = src @ T[:3, :3].T + T[:3, 3]
    assert np.abs(aligned - dst).mean() < 0.02

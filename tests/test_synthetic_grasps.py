"""Geometric grasp-oracle sanity tests."""

import numpy as np

from giga_tpu.core.transform import Rotation, Transform
from giga_tpu.geometry.mesh import box_mesh
from giga_tpu.utils.synthetic import icosphere
from giga_tpu.utils.synthetic_grasps import (
    MAX_OPENING,
    evaluate_grasp,
    grasp_frame,
    sample_labeled_grasps,
)


def top_down_pose(x, y, z):
    """TCP above the scene approaching straight down (normal = +z)."""
    return Transform(grasp_frame(np.r_[0.0, 0.0, 1.0], 0.0), np.r_[x, y, z])


class TestOracle:
    def test_thin_box_graspable_from_above(self):
        m = box_mesh([0.03, 0.03, 0.06], center=(0.15, 0.15, 0.03))
        rng = np.random.RandomState(0)
        surf, _ = m.sample_surface(20000, rng=rng)
        label, width = evaluate_grasp(m, surf, top_down_pose(0.15, 0.15, 0.07), rng)
        assert label == 1
        assert 0.02 < width <= MAX_OPENING

    def test_oversized_sphere_not_graspable(self):
        r = 0.055  # diameter 0.11 > 0.08 opening
        m = icosphere(r, [0.15, 0.15, r], 2)
        rng = np.random.RandomState(1)
        surf, _ = m.sample_surface(20000, rng=rng)
        # grasp at the equator: fingers collide with the sphere
        label, _ = evaluate_grasp(m, surf, top_down_pose(0.15, 0.15, r), rng)
        assert label == 0

    def test_free_space_not_graspable(self):
        m = box_mesh([0.03, 0.03, 0.03], center=(0.25, 0.25, 0.015))
        rng = np.random.RandomState(2)
        surf, _ = m.sample_surface(20000, rng=rng)
        label, _ = evaluate_grasp(m, surf, top_down_pose(0.05, 0.05, 0.1), rng)
        assert label == 0  # closing region empty

    def test_sampler_returns_mixed_labels(self):
        rng = np.random.RandomState(3)
        scene = box_mesh([0.03, 0.03, 0.06], center=(0.15, 0.15, 0.03))
        gl = sample_labeled_grasps(scene, 0.3, 40, rng)
        labels = [l for _, l in gl]
        assert len(gl) == 40
        assert 0 < sum(labels) < len(labels)

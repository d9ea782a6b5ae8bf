"""Planner at non-default query resolutions (reference detection_implicit.py
supports resolution != 40 with a matching tsdf_process volume)."""

import numpy as np

import jax
import jax.numpy as jnp

from giga_tpu.inference.planner import GIGAPlanner, State
from giga_tpu.models.registry import get_network


def test_planner_resolution_24():
    net, cfg = get_network("giga")
    tsdf0 = jnp.zeros((1, 40, 40, 40))
    p0 = jnp.zeros((1, 1, 3))
    params = net.init(jax.random.PRNGKey(0), tsdf0, p0, p0)
    planner = GIGAPlanner(
        net=net, model_cfg=cfg, params=params, resolution=24,
        force_detection=True, best=True, rng=np.random.RandomState(0),
    )
    rng = np.random.RandomState(1)
    grid = rng.rand(1, 40, 40, 40).astype(np.float32)
    process = rng.rand(24, 24, 24).astype(np.float32)  # matches query lattice
    grasps, scores, toc = planner(State(tsdf=grid, tsdf_process=process))
    assert isinstance(grasps, list)
    for g in grasps:
        assert np.all(g.pose.translation >= 0.0)
        assert np.all(g.pose.translation <= 0.3)

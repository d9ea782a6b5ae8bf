"""Device mesh + sharding helpers.

The reference has no model-level distribution at all (SURVEY.md section 2.3);
this module is new TPU-native surface. At GIGA's scale (~600k params) the
right decomposition is pure data parallelism over ICI: parameters replicated,
the batch (and any large query-point axis) sharded over a 1D ``dp`` mesh.
Multi-host extends the same mesh over DCN via jax.distributed.

``query_sharded`` additionally shards a dense query decode over devices —
the 64k-point decode is a pure map, and plane features are small enough
(3 x 40^2 x 32 floats ~ 600 KB) to replicate, so no halo exchange is needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis sharding for batched arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

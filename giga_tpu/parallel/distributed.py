"""Multi-host initialization + cross-host utilities.

Single-slice TPU pods see all chips through one process per host;
``initialize()`` wires jax.distributed so jax.devices() spans the slice and
the dp mesh in giga_tpu.parallel.mesh rides ICI within a slice and DCN
across slices. The reference has no distributed layer at all (SURVEY §2.3).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None) -> None:
    """Idempotent jax.distributed init (env-driven when args are None)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process environment without coordinator config
        pass


def is_primary() -> bool:
    return jax.process_index() == 0


def global_batch_slice(global_batch: int):
    """This host's slice of a globally-sharded batch (per-host data loading)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)

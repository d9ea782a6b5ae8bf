"""Multi-host initialization + cross-host utilities.

Single-slice TPU pods see all chips through one process per host;
``initialize()`` wires jax.distributed so jax.devices() spans the slice and
the dp mesh in giga_tpu.parallel.mesh rides ICI within a slice and DCN
across slices. The reference has no distributed layer at all (SURVEY §2.3).

Exercised by tests/test_distributed.py: a real 2-process CPU cluster
(coordinator + worker subprocesses) initializes, sees process_count()==2,
and psum-reduces a metric across hosts.
"""

from __future__ import annotations

import os

import jax

# env vars that mean "the launcher configured a cluster for us" — either
# JAX's own spec or a recognized cluster environment jax can auto-detect
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_ID",
    "OMPI_MCA_orte_hnp_uri",
)


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs) -> bool:
    """Idempotent jax.distributed init. Returns True when running distributed.

    - With explicit args (or a recognized cluster env), initialization errors
      PROPAGATE — a misconfigured cluster must fail loudly, not degrade to
      silent single-process training.
    - With no args and no cluster env, this is a documented no-op so
      single-process scripts can call it unconditionally.
    """
    if jax.distributed.is_initialized():
        return True
    explicit = any(v is not None
                   for v in (coordinator_address, num_processes, process_id))
    env_driven = any(v in os.environ for v in _CLUSTER_ENV_VARS)
    if not explicit and not env_driven:
        return False  # single-process run; nothing to wire
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def is_primary() -> bool:
    return jax.process_index() == 0


def global_batch_slice(global_batch: int):
    """This host's slice of a globally-sharded batch (per-host data loading)."""
    n = jax.process_count()
    if global_batch % n:
        # silent truncation would drop the remainder rows from every epoch
        raise ValueError(
            f"global_batch {global_batch} not divisible by process_count {n}"
        )
    per_host = global_batch // n
    start = jax.process_index() * per_host
    return slice(start, start + per_host)

"""giga_tpu — a TPU-native 6-DoF grasp-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
UT-Austin-RPL/GIGA (RSS 2021): implicit grasp detection from TSDF volumes
via a triplane encoder and local implicit decoders, together with the
surrounding self-supervised data pipeline, training stack, simulated
clutter-removal benchmark, and occupancy-to-mesh reconstruction tools.

Layout:
    core/        host-side math & types (transforms, grasps, dataset IO, configs)
    ops/         device ops (plane sampling, stencil filters, TSDF fusion, scatter)
    models/      flax modules (triplane encoder, U-Nets, implicit decoders, VGN)
    inference/   the jitted TSDF-in -> ranked-grasps-out planner
    train/       losses, train step, data pipeline, metrics
    parallel/    device-mesh / sharding helpers
    sim/         PyBullet clutter simulator (optional dependency, import-gated)
    experiments/ clutter-removal benchmark harness
    geometry/    occupancy -> mesh extraction + mesh metrics
    utils/       visualization and misc helpers
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compile cache: remote-tunnel compiles cost up to ~350 s per
# program (train step); the disk cache pays that once across processes and
# sessions. Opt out with GIGA_TPU_NO_COMPILE_CACHE=1; override the location
# with JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("GIGA_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                # same location bench.py uses, so scripts and the benchmark
                # share warm compiles
                _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                              _os.pardir, ".jax_cache"),
            ),
        )
    except Exception:  # pragma: no cover — the cache is an optimization only
        pass

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

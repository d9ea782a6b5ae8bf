"""Production serving: micro-batching grasp-planning service.

The reference serves one scene per ``VGNImplicit.__call__`` (reference:
detection_implicit.py:33-85) — fine for a single robot cell, but a fleet or
a simulation farm wants the batched program (DESIGN.md §9: the B=64 bf16
Pallas path plans ~3,500 scenes/s on one v5e chip, vs ~700/s single-scene).
This module turns the batched planner into a service: callers submit single
TSDF grids from any thread and get ``Future``s back; a worker thread packs
requests into fixed-size batches, dispatches ONE compiled device program per
batch, and resolves each request with exactly what the single-scene planner
would have returned.

TPU-shaped decisions:
- **Fixed batch shape.** Partial batches are padded (repeating the last
  grid) so every load level hits the same compiled executable — dynamic
  batch sizes would recompile per occupancy under jit.
- **Lag-1 pipelining.** Batch k+1 is dispatched before batch k's results
  are fetched, overlapping device execution and the host transfer with the
  next dispatch. On remote-tunnel backends the host fetch is the only true
  barrier (utils/benchmark.py), so this hides most of the per-batch RTT.
- **Adaptive micro-batching.** The worker waits at most ``max_wait_ms`` for
  the batch to fill; under light load requests still see bounded latency,
  under heavy load batches run full (best scenes/s).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from queue import Empty, Queue

import numpy as np

__all__ = ["PlannerService", "ServiceStats"]

_SHUTDOWN = object()


@dataclass
class ServiceStats:
    """Aggregate counters (read via PlannerService.stats())."""

    requests: int = 0
    batches: int = 0
    padded_slots: int = 0
    errors: int = 0
    wall_s: float = 0.0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def snapshot(self) -> dict:
        with self._lock:
            occ = (
                self.requests / (self.requests + self.padded_slots)
                if self.requests
                else 0.0
            )
            return {
                "requests": self.requests,
                "batches": self.batches,
                "mean_batch_occupancy": occ,
                "errors": self.errors,
                "scenes_per_sec": self.requests / self.wall_s
                if self.wall_s > 0
                else 0.0,
            }


class PlannerService:
    """Micro-batching front-end over a GIGAPlanner's batched program.

    Args:
        planner: a ``GIGAPlanner`` (its precision/postprocess config and
            params are served as-is; results match ``planner.plan_batch``).
        batch_size: device batch B — one executable of this shape serves
            all traffic. 64 is the measured serving sweet spot on v5e.
        max_wait_ms: max time the batcher waits for a batch to fill before
            dispatching a padded partial batch.
        queue_depth: submit() raises when this many requests are pending
            (backpressure instead of unbounded memory growth).

    Usage::

        svc = PlannerService(planner, batch_size=64)
        fut = svc.submit(tsdf)            # from any thread
        grasps, scores = fut.result()
        svc.close()
    """

    def __init__(self, planner, batch_size: int = 64, max_wait_ms: float = 2.0,
                 queue_depth: int = 1024):
        from giga_tpu.inference.planner import build_batched_giga_planner_fn

        self.planner = planner
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) * 1e-3
        self._queue: Queue = Queue(maxsize=queue_depth)
        self._stats = ServiceStats()
        if planner._vfn is None:  # share plan_batch's program if prebuilt
            planner._vfn = build_batched_giga_planner_fn(
                planner.net, planner.model_cfg, planner.planner_cfg,
                planner.size, dtype=planner._dtype, use_pallas=True,
            )
        self._vfn = planner._vfn
        self._closed = False
        self._worker = threading.Thread(
            target=self._run, name="giga-planner-service", daemon=True
        )
        self._worker.start()

    # -- client surface ----------------------------------------------------

    def submit(self, tsdf_grid) -> Future:
        """Queue one (R, R, R) (or (1, R, R, R)) TSDF; resolves to
        (grasps, scores) exactly as the single-scene planner returns them."""
        if self._closed:
            raise RuntimeError("PlannerService is closed")
        grid = np.asarray(tsdf_grid, np.float32)
        grid = grid.reshape(grid.shape[-3:])
        R = self.planner.planner_cfg.resolution
        if grid.shape != (R, R, R):
            # reject here, not in the worker: a bad grid batched with good
            # requests would otherwise fail the whole batch
            raise ValueError(f"expected ({R}, {R}, {R}) TSDF, got {grid.shape}")
        fut: Future = Future()
        self._queue.put((grid, fut))
        return fut

    def plan(self, tsdf_grid, timeout: float | None = None):
        """Synchronous convenience wrapper around submit()."""
        return self.submit(tsdf_grid).result(timeout=timeout)

    def stats(self) -> dict:
        return self._stats.snapshot()

    def close(self, timeout: float | None = 30.0):
        """Drain queued requests, stop the worker. Idempotent."""
        if self._closed:
            return
        self._closed = True
        self._queue.put((_SHUTDOWN, None))
        self._worker.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker ------------------------------------------------------------

    def _gather_batch(self):
        """Block for the first request, then fill up to batch_size within
        the max_wait deadline. Returns (items, saw_shutdown)."""
        try:
            first = self._queue.get(timeout=0.1)
        except Empty:
            return [], False
        if first[0] is _SHUTDOWN:
            return [], True
        items = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.batch_size:
            budget = deadline - time.monotonic()
            try:
                nxt = self._queue.get(timeout=max(budget, 0.0))
            except Empty:
                break
            if nxt[0] is _SHUTDOWN:
                return items, True
            items.append(nxt)
        return items, False

    def _dispatch(self, items):
        """One padded device dispatch; returns (device result, items)."""
        import jax.numpy as jnp

        grids = [g for g, _ in items]
        pad = self.batch_size - len(grids)
        with self._stats._lock:
            self._stats.padded_slots += pad
        if pad:
            grids = grids + [grids[-1]] * pad
        batch = jnp.asarray(np.stack(grids))
        cands_b, _ = self._vfn(self.planner.params, batch, batch)
        return cands_b, items

    def _resolve(self, cands_b, items):
        """Fetch a dispatched batch (the true barrier) and resolve futures."""
        import jax

        from giga_tpu.inference.planner import (
            GraspCandidates,
            candidates_to_grasps,
        )

        host = jax.device_get(cands_b)
        p = self.planner
        for i, (_, fut) in enumerate(items):
            if fut.cancelled():
                continue
            cands = GraspCandidates(*(x[i] for x in host))
            fut.set_result(candidates_to_grasps(
                cands, scale=p.size, offset=0.5, width_scale=p.size,
                best=p.planner_cfg.best, rng=p.rng,
            ))

    def _run(self):
        pending = deque()  # lag-1: at most one un-fetched dispatched batch
        shutdown = False
        t0 = None
        while not shutdown:
            items, shutdown = self._gather_batch()
            if items:
                if t0 is None:
                    t0 = time.monotonic()
                try:
                    pending.append(self._dispatch(items))
                except Exception as e:  # noqa: BLE001 — fail the batch, not the service
                    with self._stats._lock:
                        self._stats.errors += len(items)
                    for _, fut in items:
                        if not fut.cancelled():
                            fut.set_exception(e)
                    continue
                with self._stats._lock:
                    self._stats.requests += len(items)
                    self._stats.batches += 1
            # lag-1 drain: keep one dispatched batch in flight while more
            # work is queued (overlaps device compute + fetch with the next
            # dispatch); fetch immediately when the queue is idle so light
            # load sees no extra latency
            while pending and (shutdown or len(pending) > 1
                               or self._queue.empty()):
                cands_b, batch_items = pending.popleft()
                try:
                    self._resolve(cands_b, batch_items)
                except Exception as e:  # noqa: BLE001
                    with self._stats._lock:
                        self._stats.errors += len(batch_items)
                    for _, fut in batch_items:
                        if not fut.cancelled() and not fut.done():
                            fut.set_exception(e)
            if t0 is not None:
                with self._stats._lock:
                    self._stats.wall_s = time.monotonic() - t0
        # reject anything that raced into the queue after shutdown
        while True:
            try:
                item, fut = self._queue.get_nowait()
            except Empty:
                break
            if item is not _SHUTDOWN and fut is not None:
                fut.set_exception(RuntimeError("PlannerService closed"))

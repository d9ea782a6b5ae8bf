"""Production serving: micro-batching grasp-planning service.

The reference serves one scene per ``VGNImplicit.__call__`` (reference:
detection_implicit.py:33-85) — fine for a single robot cell, but a fleet or
a simulation farm wants the batched program (DESIGN.md §9: the B=64 bf16
Pallas path plans ~4,500 scenes/s on one v5e chip, vs ~700/s single-scene).
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

Lifecycle contract: every accepted submit() resolves — with a result, the
batch's exception, or CancelledError if the caller cancelled before the
batch was packed. close() drains already-queued work (so no accepted future
is orphaned) and then stops the worker; submissions racing with close()
either complete or raise, never hang.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future, InvalidStateError
from dataclasses import dataclass, field
from queue import Empty, Full, Queue

import numpy as np

__all__ = ["PlannerService", "ServiceStats"]


@dataclass
class ServiceStats:
    """Aggregate counters (read via PlannerService.stats()).

    ``busy_s`` accumulates only wall time spent dispatching/fetching (idle
    polling excluded), so ``scenes_per_sec`` reflects serving capacity, not
    how long the service has been sitting around.
    """

    requests: int = 0
    batches: int = 0
    padded_slots: int = 0
    errors: int = 0
    busy_s: float = 0.0
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
                "scenes_per_sec": self.requests / self.busy_s
                if self.busy_s > 0
                else 0.0,
            }


def _fail(fut: Future, exc: Exception):
    """set_exception tolerant of a concurrent cancel()."""
    try:
        fut.set_exception(exc)
    except InvalidStateError:
        pass


class PlannerService:
    """Micro-batching front-end over a GIGAPlanner's batched program.

    Args:
        planner: a ``GIGAPlanner`` (its precision/postprocess config and
            params are served as-is; results match ``planner.plan_batch``).
        batch_size: device batch B — one executable of this shape serves
            all traffic. 64 is the measured serving sweet spot on v5e.
        max_wait_ms: max time the batcher waits for a batch to fill before
            dispatching a padded partial batch.
        queue_depth: submit() raises RuntimeError when this many requests
            are pending (backpressure instead of unbounded memory growth).

    Usage::

        svc = PlannerService(planner, batch_size=64)
        fut = svc.submit(tsdf)            # from any thread
        grasps, scores = fut.result()
        svc.close()
    """

    def __init__(self, planner, batch_size: int = 64, max_wait_ms: float = 2.0,
                 queue_depth: int = 1024):
        self.planner = planner
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) * 1e-3
        self.queue_depth = int(queue_depth)
        self._queue: Queue = Queue(maxsize=queue_depth)
        self._stats = ServiceStats()
        self._vfn = planner._ensure_batched_fn()
        self._closed = False
        self._close_lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(
            target=self._run, name="giga-planner-service", daemon=True
        )
        self._worker.start()

    # -- client surface ----------------------------------------------------

    def submit(self, tsdf_grid) -> Future:
        """Queue one (R, R, R) (or (1, R, R, R)) TSDF; resolves to
        (grasps, scores) exactly as the single-scene planner returns them.

        Raises RuntimeError when the service is closed or the queue is at
        queue_depth (backpressure), ValueError on a wrong grid shape.
        """
        grid = np.asarray(tsdf_grid, np.float32)
        grid = grid.reshape(grid.shape[-3:])
        R = self.planner.planner_cfg.resolution
        if grid.shape != (R, R, R):
            # reject here, not in the worker: a bad grid batched with good
            # requests would otherwise fail the whole batch
            raise ValueError(f"expected ({R}, {R}, {R}) TSDF, got {grid.shape}")
        fut: Future = Future()
        # the lock orders submit against close(): once close() flips _closed
        # under the lock, nothing new can enter the queue, so the worker's
        # final drain cannot strand an accepted future
        with self._close_lock:
            if self._closed:
                raise RuntimeError("PlannerService is closed")
            try:
                self._queue.put_nowait((grid, fut))
            except Full:
                raise RuntimeError(
                    f"PlannerService queue full ({self.queue_depth} pending)"
                ) from None
        return fut

    def plan(self, tsdf_grid, timeout: float | None = None):
        """Synchronous convenience wrapper around submit()."""
        return self.submit(tsdf_grid).result(timeout=timeout)

    def stats(self) -> dict:
        return self._stats.snapshot()

    def close(self, timeout: float | None = 30.0):
        """Drain already-queued requests, then stop the worker. Idempotent.

        If the device wedges mid-fetch the join can time out; the daemon
        worker then dies with the process rather than blocking exit.
        """
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
        self._stop.set()
        self._worker.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker ------------------------------------------------------------

    def _gather_batch(self):
        """Block briefly for the first request, then fill up to batch_size
        within the max_wait deadline."""
        try:
            first = self._queue.get(timeout=0.1)
        except Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.batch_size:
            budget = deadline - time.monotonic()
            try:
                items.append(self._queue.get(timeout=max(budget, 0.0)))
            except Empty:
                break
        return items

    def _dispatch(self, items):
        """One padded device dispatch; returns (device result, items, pad)."""
        import jax.numpy as jnp

        grids = [g for g, _ in items]
        pad = self.batch_size - len(grids)
        if pad:
            grids = grids + [grids[-1]] * pad
        batch = jnp.asarray(np.stack(grids))
        cands_b, _ = self._vfn(self.planner.params, batch, batch)
        return cands_b, items, pad

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
            cands = GraspCandidates(*(x[i] for x in host))
            fut.set_result(candidates_to_grasps(
                cands, scale=p.size, offset=0.5, width_scale=p.size,
                best=p.planner_cfg.best, rng=p.rng,
            ))

    def _drain_one(self, pending: deque):
        cands_b, batch_items = pending.popleft()
        try:
            self._resolve(cands_b, batch_items)
        except Exception as e:  # noqa: BLE001 — fail the batch, not the service
            with self._stats._lock:
                self._stats.errors += len(batch_items)
            for _, fut in batch_items:
                if not fut.done():
                    _fail(fut, e)

    def _run(self):
        pending: deque = deque()  # lag-1: at most one un-fetched batch
        while True:
            stopping = self._stop.is_set()
            items = self._gather_batch()
            # transition accepted futures to RUNNING; a future whose caller
            # cancelled before packing is dropped here (and its waiters
            # notified) — afterwards cancel() can no longer race set_result
            live = [(g, f) for g, f in items
                    if f.set_running_or_notify_cancel()]
            t_iter = time.monotonic() if (live or pending) else None
            if live:
                try:
                    pending.append(self._dispatch(live)[:2])
                    pad = self.batch_size - len(live)
                    with self._stats._lock:
                        self._stats.requests += len(live)
                        self._stats.batches += 1
                        self._stats.padded_slots += pad
                except Exception as e:  # noqa: BLE001
                    with self._stats._lock:
                        self._stats.errors += len(live)
                    for _, fut in live:
                        _fail(fut, e)
            # lag-1 drain: keep one dispatched batch in flight while more
            # work is queued (overlaps device compute + fetch with the next
            # dispatch); fetch immediately when the queue is idle so light
            # load sees no extra latency. Dispatch failures above fall
            # through here, so a pending batch is never stranded.
            while pending and (stopping or len(pending) > 1
                               or self._queue.empty()):
                self._drain_one(pending)
            if t_iter is not None:
                with self._stats._lock:
                    self._stats.busy_s += time.monotonic() - t_iter
            if stopping and not pending and self._queue.empty():
                return

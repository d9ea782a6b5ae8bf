"""Honest device timing through remote-accelerator tunnels.

The axon TPU backend (and remote runtimes like it) report arrays as "ready"
while the computation is still queued remotely: ``jax.block_until_ready``
returns in dispatch time (~0.25 ms), NOT execution time. Per-call timings
built on it measure the RPC floor and can overstate throughput by 1000x
(discovered in round 2: the round-1 "0.12 ms/scene" planner latency was a
dispatch time; the true device latency was ~3.6 ms).

The only reliable synchronization is a host fetch of output data. To measure
true per-call latency, run ``n`` calls with ONE synchronizing fetch at the
end and take the marginal slope:

    t(n_hi) - t(n_lo)
    -----------------  ==  per-call device (+ queue) time
       n_hi - n_lo

which cancels the fetch cost and the constant dispatch overhead of the first
call. ``dispatch_floor`` (the slope of a trivial program) is reported
separately so flop-level analysis can subtract it.
"""

from __future__ import annotations

import time

import numpy as np


def _sync_fetch(result):
    """Force one element of the result tree onto the host (true barrier)."""
    import jax

    leaf = jax.tree.leaves(result)[0]
    np.asarray(leaf).ravel()[:1]


def true_latency(fn, args_list, n_lo: int = 1, n_hi: int = 33, repeats: int = 3) -> float:
    """Marginal per-call seconds of ``fn(*args)`` via end-fetch scaling.

    WARNING (round-3 finding): cycling a small args_list does NOT defeat the
    axon tunnel's replay caching of repeated identical dispatches — this
    protocol measured a 762-GFLOP batch at 0.315 ms (2.4 PFLOP/s,
    impossible) with ±80% spread. For kernel/serving numbers use
    ``serial_chain_latency`` (each iteration's input depends on the previous
    output, so no dispatch ever repeats). true_latency remains valid for
    calls whose inputs genuinely differ every invocation.

    Args:
        fn: jitted callable (must already be warm for every args shape).
        args_list: list of argument tuples cycled through.
    """
    def run_n(n: int) -> float:
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = fn(*args_list[i % len(args_list)])
        _sync_fetch(r)
        return time.perf_counter() - t0

    run_n(1)  # warm the fetch path
    lo = min(run_n(n_lo) for _ in range(repeats))
    hi = min(run_n(n_hi) for _ in range(repeats))
    return max((hi - lo) / (n_hi - n_lo), 1e-9)


def pipelined_throughput(fn, args_list, n: int = 64, repeats: int = 3) -> float:
    """Scenes/sec with lag-1 double buffering and HONEST accounting.

    Issues call i, then host-fetches call i-1's result — so the device (and
    the tunnel transfer of the previous result) overlaps the next dispatch,
    but EVERY result still lands on the host (a true barrier per call; no
    round-1-style dispatch-floor artifacts). This is the realistic serving
    number for a scan->plan->act loop that needs each scene's grasps back.
    """
    r = fn(*args_list[0])
    _sync_fetch(r)  # warm the fetch path

    def run() -> float:
        t0 = time.perf_counter()
        prev = None
        for i in range(n):
            cur = fn(*args_list[i % len(args_list)])
            if prev is not None:
                _sync_fetch(prev)
            prev = cur
        _sync_fetch(prev)
        return time.perf_counter() - t0

    return n / min(run() for _ in range(repeats))


def serial_chain_latency(loop_fn, args, inner: int = 8, repeats: int = 3) -> float:
    """Per-iteration seconds of a DEVICE-SIDE serial chain (the strongest
    honesty protocol on remote tunnels).

    ``loop_fn(n, *args)`` must be a callable (jit-compiled with static n)
    that runs the measured computation n times serially on device — each
    iteration data-dependent on the previous (e.g. perturb the input with
    the last iteration's reduced output) — and returns a small array.
    Because the chain lives inside ONE program, nothing can be replay-
    cached, deduplicated, overlapped, or hidden behind the dispatch floor;
    ``true_latency``'s cycled-inputs protocol was caught being replay-
    cached by the axon tunnel (a 762-GFLOP batch "ran" in 0.315 ms).

    Returns median over ``repeats`` of (t(1+inner) - t(1)) / inner, with
    both program sizes compiled before timing.
    """
    import jax

    def run(n):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(loop_fn(n, *args))[0])
        return time.perf_counter() - t0

    run(1)
    run(1 + inner)  # compile both before timing
    ds = sorted(run(1 + inner) - run(1) for _ in range(repeats))
    return max(ds[len(ds) // 2] / inner, 1e-9)


def pipelined_throughput_async(fn, args_list, n: int = 64, depth: int = 8,
                               repeats: int = 3) -> float:
    """Scenes/sec with depth-k in-flight async host transfers.

    ``pipelined_throughput`` (lag-1, synchronous fetch) is bounded by the
    link's per-fetch round-trip (~25 ms through the axon tunnel — each
    ``device_get`` serializes an RPC). Here every call's result transfer is
    STARTED immediately (``copy_to_host_async``) and only COMPLETED lag
    ``depth`` behind, so up to ``depth`` transfers are in flight and, if the
    transport pipelines them, per-scene cost approaches
    max(compute, transfer) instead of compute + RTT. Accounting stays
    honest: every result is materialized as host numpy inside the timed
    region.
    """
    import jax

    def issue(args):
        r = fn(*args)
        for leaf in jax.tree.leaves(r):
            leaf.copy_to_host_async()
        return r

    def complete(r):
        for leaf in jax.tree.leaves(r):
            np.asarray(leaf)

    complete(issue(args_list[0]))  # warm

    def run() -> float:
        t0 = time.perf_counter()
        pending = []
        for i in range(n):
            pending.append(issue(args_list[i % len(args_list)]))
            if len(pending) > depth:
                complete(pending.pop(0))
        for r in pending:
            complete(r)
        return time.perf_counter() - t0

    return n / min(run() for _ in range(repeats))


def dispatch_floor(repeats: int = 3) -> float:
    """Per-call cost of a trivial program (tunnel RPC + scheduling floor)."""
    import jax
    import jax.numpy as jnp

    xs = [jnp.full((8, 8), float(i)) for i in range(8)]
    tiny = jax.jit(jnp.sum)
    return true_latency(tiny, [(x,) for x in xs], repeats=repeats)

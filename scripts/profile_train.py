"""Train-step stage profile + plane-sampler A/B on the real TPU.

The bench train rows (bench.py::section_train) measure the full jitted
step (fwd + bwd + Adam) at the reference defaults (B=32, 2048 occ points,
scripts/train_giga.py:256-259). This script splits that time by variant
differencing, all under the donated-state serial-chain protocol (every
step consumes the previous step's state, so the axon tunnel can neither
replay-cache nor overlap the chain):

  full/<sampler>/<prec>   the shipped step
  fwd/<sampler>/<prec>    loss only (no grad): chained by perturbing the
                          tsdf with the previous loss
  enc/<prec>              encoder-only fwd+bwd+Adam (loss = mean square of
                          the planes) — full minus enc ~= decoder+loss cost

Sampler A/B: DecoderConfig.sampler 'gather' (4 row-gathers/point, exact;
backward = scatter-add into the planes) vs 'mm' (gather-free dense-weight
MXU matmuls, ops/sampling.py::sample_planes_concat_mm; backward = more
matmuls). Training queries ARE arbitrary points (1 grasp + 2048 occ per
sample), exactly the case where the r5 giga_geo serving work measured the
gather path 3.6x slower (8.4 -> 2.3 ms per 100k points).

Usage: python scripts/profile_train.py [--variants full,fwd,enc]
       [--samplers gather,mm] [--batch 32] [--n-occ 2048] [--reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def mk_batch(seed, B, N):
    r = np.random.RandomState(seed)
    import jax.numpy as jnp

    return {
        "tsdf": jnp.asarray(r.rand(B, 40, 40, 40), jnp.float32),
        "pos": jnp.asarray(r.uniform(-0.4, 0.4, (B, 3)), jnp.float32),
        "label": jnp.asarray(r.randint(0, 2, B), jnp.float32),
        "rotations": jnp.asarray(r.randn(B, 2, 4), jnp.float32),
        "width": jnp.asarray(r.rand(B), jnp.float32),
        "pos_occ": jnp.asarray(r.uniform(-0.4, 0.4, (B, N, 3)), jnp.float32),
        "occ": jnp.asarray(r.randint(0, 2, (B, N)), jnp.float32),
    }


def marginal(run_n, reps=3, lo_n=1, hi_n=9):
    lo = min(run_n(lo_n) for _ in range(reps))
    hi = min(run_n(hi_n) for _ in range(reps))
    return (hi - lo) / (hi_n - lo_n)


def measure_full(net, cfg, dtype, B, N, reps):
    """Marginal per-step time of the shipped train step (donated state)."""
    import jax

    from giga_tpu.train.trainer import create_train_state, make_train_step

    state = create_train_state(net, cfg, jax.random.PRNGKey(0))
    # sampler=None: the A/B varies the sampler through cfg itself; don't let
    # make_train_step's default 'mm' override the gather arm
    step = make_train_step(net, cfg, dtype=dtype, sampler=None)
    data = [mk_batch(s, B, N) for s in range(4)]
    live = {"state": state}
    cur, terms = step(state, data[0])  # compile
    live["state"] = cur
    np.asarray(terms["loss_all"])

    def run_n(n):
        t0 = time.perf_counter()
        cur, t = live["state"], None
        for i in range(n):
            cur, t = step(cur, data[i % 4])
        live["state"] = cur
        np.asarray(t["loss_all"])
        return time.perf_counter() - t0

    return marginal(run_n, reps)


def measure_fwd(net, cfg, dtype, B, N, reps):
    """Loss-only (no grad) marginal time; serial chain via a tsdf nudge."""
    import jax
    import jax.numpy as jnp

    from giga_tpu.train.trainer import create_train_state, make_loss_fn

    state = create_train_state(net, cfg, jax.random.PRNGKey(0))
    loss_fn = make_loss_fn(net, cfg, dtype=dtype)

    def fwd(params, batch, eps):
        batch = dict(batch)
        batch["tsdf"] = batch["tsdf"] + eps * 1e-9
        if dtype is None:
            with jax.default_matmul_precision("highest"):
                loss, _ = loss_fn(params, batch)
        else:
            loss, _ = loss_fn(params, batch)
        return loss

    jfwd = jax.jit(fwd)
    params = state.params
    data = [mk_batch(s, B, N) for s in range(4)]
    eps = jnp.float32(0.0)
    eps = jfwd(params, data[0], eps)  # compile
    np.asarray(eps)

    live = {"eps": eps}

    def run_n(n):
        t0 = time.perf_counter()
        e = live["eps"]
        for i in range(n):
            e = jfwd(params, data[i % 4], e)
        live["eps"] = e
        np.asarray(e)
        return time.perf_counter() - t0

    return marginal(run_n, reps)


def measure_enc(net, cfg, dtype, B, N, reps):
    """Encoder-only fwd+bwd+Adam: loss = mean(planes^2); donated chain."""
    import jax
    import jax.numpy as jnp

    from giga_tpu.train.trainer import TrainState, _cast_net_inputs, create_train_state

    state = create_train_state(net, cfg, jax.random.PRNGKey(0))

    def loss_fn(params, batch):
        if dtype is not None:
            params, batch = _cast_net_inputs(params, batch, dtype)
        planes = net.apply(params, batch["tsdf"], method="encode")
        return sum(jnp.mean(jnp.square(v.astype(jnp.float32)))
                   for v in planes.values())

    def step(state, batch):
        if dtype is None:
            with jax.default_matmul_precision("highest"):
                loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads=grads), loss

    jstep = jax.jit(step, donate_argnums=0)
    data = [mk_batch(s, B, N) for s in range(4)]
    cur, loss = jstep(state, data[0])
    np.asarray(loss)
    live = {"state": cur}

    def run_n(n):
        t0 = time.perf_counter()
        cur, t = live["state"], None
        for i in range(n):
            cur, t = jstep(cur, data[i % 4])
        live["state"] = cur
        np.asarray(t)
        return time.perf_counter() - t0

    return marginal(run_n, reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="full,fwd,enc")
    ap.add_argument("--samplers", default="gather,mm")
    ap.add_argument("--precisions", default="bf16,fp32")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-occ", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; the axon "
                    "plugin ignores JAX_PLATFORMS, see tests/conftest.py)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from giga_tpu.models.registry import get_network

    variants = args.variants.split(",")
    samplers = args.samplers.split(",")
    precisions = args.precisions.split(",")
    B, N = args.batch, args.n_occ

    net0, cfg0 = get_network("giga")
    nets = {}
    for s in samplers:
        cfg = dataclasses.replace(
            cfg0, decoder=dataclasses.replace(cfg0.decoder, sampler=s))
        nets[s] = (type(net0)(cfg), cfg)

    rows = []
    for prec in precisions:
        dtype = jnp.bfloat16 if prec == "bf16" else None
        for v in variants:
            if v == "enc":
                net, cfg = nets[samplers[0]]
                t = measure_enc(net, cfg, dtype, B, N, args.reps)
                rows.append((f"enc/-/{prec}", t))
                log(f"enc/-/{prec}: {t * 1e3:.2f} ms/step")
                continue
            fn = measure_full if v == "full" else measure_fwd
            for s in samplers:
                net, cfg = nets[s]
                t = fn(net, cfg, dtype, B, N, args.reps)
                rows.append((f"{v}/{s}/{prec}", t))
                log(f"{v}/{s}/{prec}: {t * 1e3:.2f} ms/step "
                    f"({B / t:.0f} samples/s)")

    print("\n=== train-step profile (B=%d, N_occ=%d) ===" % (B, N))
    for name, t in rows:
        print(f"{name:22s} {t * 1e3:8.2f} ms/step  {B / t:8.0f} samples/s")


if __name__ == "__main__":
    main()

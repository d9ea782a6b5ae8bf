"""Exactness of the two-level segmented top-k (inference/postprocess.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from giga_tpu.inference.postprocess import _top_k_two_level


def _check(flat, k):
    got_s, got_i = _top_k_two_level(jnp.asarray(flat), k)
    ref_s, ref_i = jax.lax.top_k(jnp.asarray(flat), k)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))
    # indices may differ only among exactly-equal scores
    s = np.asarray(flat)
    np.testing.assert_array_equal(
        np.take_along_axis(s, np.asarray(got_i), 1), np.asarray(ref_s)
    )


def test_matches_lax_topk_random():
    rng = np.random.RandomState(0)
    _check(rng.rand(3, 64000).astype(np.float32), 128)


def test_sparse_neg_inf_like_nms_output():
    rng = np.random.RandomState(1)
    flat = np.full((2, 64000), -np.inf, np.float32)
    for b in range(2):
        idx = rng.choice(64000, 20, replace=False)
        flat[b, idx] = rng.rand(20)
    _check(flat, 128)


def test_clustered_in_few_segments():
    # all top-k elements inside ONE segment: the segment-max ranking must
    # still retain every one of them
    flat = np.zeros((1, 64000), np.float32)
    flat[0, 256:384] = 100 + np.arange(128)
    _check(flat, 128)


def test_fallback_when_segments_short():
    rng = np.random.RandomState(2)
    _check(rng.rand(1, 64000).astype(np.float32), 256)  # S=250 < k -> fallback
    _check(rng.rand(1, 1000).astype(np.float32), 10)  # S=100 >= k -> two-level


def test_serial_chain_latency_runs():
    from giga_tpu.utils.benchmark import serial_chain_latency
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, x):
        def body(i, acc):
            return acc + ((x + acc * 1e-24) ** 2).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = serial_chain_latency(loop, (jnp.ones((64, 64)),), inner=4, repeats=2)
    assert dt > 0

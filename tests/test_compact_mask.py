"""compact_mask_anchored == jnp.nonzero on 3D masks (round-4 primitive).

The anchored two-level compaction replaced jnp.nonzero(size=) at every
band/point compaction site (generation.py); these tests pin exact index
equality, fill semantics, ordering, and overflow reporting.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from giga_tpu.geometry.generation import compact_mask_anchored


def _ref(mask, k):
    (idx,) = jnp.nonzero(jnp.asarray(mask).reshape(-1), size=k, fill_value=0)
    return np.asarray(idx)


@pytest.mark.parametrize("p,density", [(8, 0.2), (9, 0.2), (17, 0.05), (16, 0.0), (8, 1.0)])
def test_matches_nonzero_sorted(p, density):
    rng = np.random.RandomState(p)
    mask = rng.rand(p, p, p) < density
    n = int(mask.sum())
    k = max(8, int(1.5 * n) + 8)
    idx, count, cnt_a = compact_mask_anchored(jnp.asarray(mask), k, k, sort=True)
    assert int(count) == n
    np.testing.assert_array_equal(np.asarray(idx), _ref(mask, k))


def test_unsorted_is_same_set():
    rng = np.random.RandomState(0)
    mask = rng.rand(12, 12, 12) < 0.1
    n = int(mask.sum())
    k = n + 16
    idx, count, _ = compact_mask_anchored(jnp.asarray(mask), k, k)
    assert int(count) == n
    got = np.sort(np.asarray(idx)[:n])
    np.testing.assert_array_equal(got, np.sort(_ref(mask, k)[:n]))
    # fill slots are 0 like jnp.nonzero's fill_value
    assert np.all(np.asarray(idx)[n:] == 0)


def test_anchor_overflow_reported():
    # a dense mask has ~P^3/8 anchors; a tiny anchor budget must be visible
    mask = jnp.ones((8, 8, 8), bool)
    idx, count, cnt_a = compact_mask_anchored(mask, 4, 512)
    assert int(cnt_a) == 64  # true anchor count, regardless of budget
    assert int(cnt_a) > 4  # caller's overflow check fires
    # with the anchor budget satisfied the count is exact
    idx, count, cnt_a = compact_mask_anchored(mask, 64, 512, sort=True)
    assert int(count) == 512
    np.testing.assert_array_equal(np.asarray(idx), np.arange(512))


def test_count_overflow_truncates_but_counts():
    mask = jnp.ones((4, 4, 4), bool)
    idx, count, cnt_a = compact_mask_anchored(mask, 8, 16, sort=True)
    assert int(count) == 64  # true count survives for the budget check
    assert np.asarray(idx).shape == (16,)

"""Unit tests for the greedy checkpoint soup (giga_tpu/train/soup.py)."""

import numpy as np

from giga_tpu.train.soup import greedy_soup, uniform_average


def _score(params):
    # concave in w, peak at w=3: averaging toward 3 always helps
    return -float((params["w"] - 3.0) ** 2)


def make_pool(ws):
    return [(_score({"w": np.float32(w)}), {"w": np.float32(w)}, f"w={w}")
            for w in ws]


class TestGreedySoup:
    def test_keeps_improving_members(self):
        # best single is w=2 (score -1); averaging with w=4 gives w=3 (0)
        score, soup, members = greedy_soup(make_pool([2.0, 4.0]), _score,
                                           verbose=None)
        assert members == ["w=2.0", "w=4.0"]
        assert np.isclose(soup["w"], 3.0)
        assert score == 0.0

    def test_drops_harmful_members(self):
        # w=2.5 scores -0.25; adding w=9 would average to 5.75 (worse) ->
        # dropped; adding w=3.5 averages to 3.0 -> kept
        score, soup, members = greedy_soup(make_pool([2.5, 3.5, 9.0]),
                                           _score, verbose=None)
        assert "w=9.0" not in members
        assert np.isclose(soup["w"], 3.0)
        assert score == 0.0

    def test_k_limits_pool(self):
        # with k=1 only the best single candidate is considered
        score, soup, members = greedy_soup(make_pool([2.0, 4.0]), _score,
                                           k=1, verbose=None)
        assert members == ["w=2.0"] and np.isclose(soup["w"], 2.0)

    def test_ranked_order_is_by_score_not_insertion(self):
        # w=3.1 scores best and must seed the soup even though listed last
        _, soup, members = greedy_soup(make_pool([9.0, 3.1]), _score,
                                       verbose=None)
        assert members[0] == "w=3.1"

    def test_uniform_weights_over_members(self):
        # three kept members -> exact uniform mean: greedy incremental
        # weights (1/2 then 1/3) reduce to 1/3 each
        pool = make_pool([2.0, 3.0, 4.0])
        _, soup, members = greedy_soup(pool, _score, verbose=None)
        if len(members) == 3:
            assert np.isclose(soup["w"], 3.0)

    def test_uniform_average_pytrees(self):
        trees = [{"a": np.float32(1.0), "b": np.ones(3)},
                 {"a": np.float32(3.0), "b": 3 * np.ones(3)}]
        avg = uniform_average(trees)
        assert np.isclose(avg["a"], 2.0)
        assert np.allclose(avg["b"], 2.0)

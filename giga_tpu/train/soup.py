"""Greedy checkpoint soup over a pool of scored candidates.

Within a single training trajectory all checkpoints share a loss basin, so
a uniform average of several good ones is usually at least as good as the
best single step and much flatter under eval noise (Wortsman et al. 2022,
"Model soups", applied along one run instead of across runs). The selection
metric here (oracle GSR) oscillates 30+ points between adjacent evals while
val accuracy is monotone — exactly the regime where averaging helps.

Used by scripts/train_corpus.py after the main loop; the reference has no
analog (train_giga.py keeps only the single best-val checkpoint,
reference train_giga.py:98-117).
"""

import jax
import numpy as np


def greedy_soup(pool, score_fn, k=None, verbose=print):
    """Greedily average the top-k scored candidates.

    pool: list of (score, params_pytree, tag). score_fn(params) -> float.
    Starts from the best candidate; each next-best is averaged in (uniform
    weights over members) and kept only if the souped params score at least
    as well as the current soup. Returns (score, params, member_tags).
    """
    ranked = sorted(pool, key=lambda c: -c[0])
    if k is not None:
        ranked = ranked[:k]
    soup, n_in, soup_score = ranked[0][1], 1, ranked[0][0]
    members = [ranked[0][2]]
    for cand_score, cand_params, tag in ranked[1:]:
        w = 1.0 / (n_in + 1)
        cand = jax.tree.map(lambda a, b: (1 - w) * a + w * b,
                            soup, cand_params)
        new_score = float(score_fn(cand))
        keep = new_score >= soup_score
        if verbose is not None:
            verbose(f"soup + {tag} ({cand_score:.1f}): {new_score:.1f} "
                    f"{'kept' if keep else 'dropped'}")
        if keep:
            soup, n_in, soup_score = cand, n_in + 1, new_score
            members.append(tag)
    return soup_score, soup, members


def uniform_average(params_list):
    """Plain uniform average of a list of pytrees (numpy or jax leaves)."""
    n = float(len(params_list))
    return jax.tree.map(lambda *xs: sum(np.asarray(x) for x in xs) / n,
                        *params_list)

"""Point-cloud ICP alignment (role of ConvONets/utils/icp.py).

Rigid (rotation + translation [+ optional scale]) alignment of a source
cloud onto a target via iterated nearest-neighbor correspondence and the
Kabsch/Umeyama closed form. scipy cKDTree supplies the NN queries.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def best_fit_transform(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares rigid transform mapping src -> dst (paired points).

    Returns (T 4x4, R 3x3, t (3,)).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    s = src - mu_s
    d = dst - mu_d
    H = s.T @ d
    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:  # reflection fix
        Vt[-1] *= -1
        R = Vt.T @ U.T
    scale = 1.0
    if with_scale:
        scale = S.sum() / max((s**2).sum(), 1e-12)
        R = R * scale
    t = mu_d - R @ mu_s
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T, R, t


def icp(src: np.ndarray, dst: np.ndarray, max_iterations: int = 50,
        tolerance: float = 1e-7, with_scale: bool = False):
    """Iterative closest point: align src onto dst.

    Returns (T 4x4, final mean NN distance, iterations used).
    """
    tree = cKDTree(dst)
    cur = np.asarray(src, float).copy()
    prev_err = np.inf
    T_total = np.eye(4)
    it = 0
    for it in range(max_iterations):
        dist, idx = tree.query(cur)
        T, R, t = best_fit_transform(cur, dst[idx], with_scale)
        cur = cur @ T[:3, :3].T + T[:3, 3]
        T_total = T @ T_total
        err = dist.mean()
        if abs(prev_err - err) < tolerance:
            break
        prev_err = err
    dist, _ = tree.query(cur)
    return T_total, float(dist.mean()), it + 1

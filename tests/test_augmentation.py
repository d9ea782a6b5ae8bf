"""Augmentation consistency: the voxel grid and the grasp pose must move
together (reference: dataset_voxel.py:114-135)."""

import numpy as np

from giga_tpu.core.transform import Rotation
from giga_tpu.train.data import apply_aug_transform


def test_grid_and_pose_move_together():
    rng = np.random.RandomState(0)
    # distinctive blob at a known voxel
    grid = np.zeros((40, 40, 40), np.float32)
    src = np.array([28.0, 14.0, 22.0])
    grid[26:31, 12:17, 20:25] = 1.0

    ori = Rotation.identity()
    g2, ori2, pos2 = apply_aug_transform(grid.copy(), ori, src.copy(), rng)

    # the blob's center of mass must land (close to) the transformed position
    com = np.array(np.nonzero(g2 > 0.5)).mean(axis=1)
    # order-0 resampling quantizes: allow ~1.5 voxel slack
    assert np.linalg.norm(com - pos2) < 1.5, (com, pos2)
    # mass is preserved up to boundary clipping
    assert 0.5 < g2.sum() / grid.sum() <= 1.01


def test_rotation_is_z_only_and_quarter_turn():
    rng = np.random.RandomState(1)
    grid = np.zeros((40, 40, 40), np.float32)
    ori = Rotation.identity()
    _, ori2, _ = apply_aug_transform(grid, ori, np.array([20.0, 20.0, 20.0]), rng)
    rotvec = ori2.as_rotvec()
    # rotation axis is z
    assert abs(rotvec[0]) < 1e-9 and abs(rotvec[1]) < 1e-9
    angle = rotvec[2] % (2 * np.pi)
    k = angle / (np.pi / 2)
    assert abs(k - round(k)) < 1e-9

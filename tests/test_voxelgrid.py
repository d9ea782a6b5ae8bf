"""VoxelGrid + binvox IO (role of ConvONets/utils/voxels.py + binvox_rw.py)."""

import io

import numpy as np
import pytest

from giga_tpu.geometry.mesh import TriMesh
from giga_tpu.geometry.voxelgrid import VoxelGrid, read_binvox, write_binvox


def _box_mesh(half=0.3, center=(0.0, 0.0, 0.0)):
    c = np.asarray(center)
    corners = np.array(
        [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], float
    )
    v = (corners * 2 - 1) * half + c
    f = []
    for ax, sign, quad in [
        (0, -1, (0, 4, 6, 2)), (0, 1, (1, 3, 7, 5)),
        (1, -1, (0, 1, 5, 4)), (1, 1, (2, 6, 7, 3)),
        (2, -1, (0, 2, 3, 1)), (2, 1, (4, 5, 7, 6)),
    ]:
        f += [[quad[0], quad[1], quad[2]], [quad[0], quad[2], quad[3]]]
    return TriMesh(v, np.asarray(f))


@pytest.fixture(scope="module")
def grid():
    return VoxelGrid.from_mesh(_box_mesh(), 16, loc=(0, 0, 0), scale=1.0)


def test_from_mesh_solid(grid):
    # the box spans [-0.3, 0.3]: ~60% of each axis -> ~0.216 fill
    fill = grid.data.mean()
    assert 0.15 < fill < 0.3, fill
    # center occupied, corners empty
    assert grid.data[8, 8, 8]
    assert not grid.data[0, 0, 0] and not grid.data[15, 15, 15]


def test_contains_matches_grid(grid):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (500, 3))
    inside = grid.contains(pts)
    # points well inside the box are occupied; far outside are not
    assert grid.contains(np.zeros(3))
    assert not grid.contains(np.array([0.45, 0.45, 0.45]))
    idx = np.clip(np.floor((pts + 0.5) * 16).astype(int), 0, 15)
    np.testing.assert_array_equal(inside, grid.data[idx[:, 0], idx[:, 1], idx[:, 2]])


def test_down_sample(grid):
    d = grid.down_sample(2)
    assert d.resolution == 8
    fine = grid.data.reshape(8, 2, 8, 2, 8, 2).any(axis=(1, 3, 5))
    np.testing.assert_array_equal(d.data, fine)


def test_to_mesh_closed_and_oriented(grid):
    m = grid.to_mesh()
    assert len(m.faces) > 0
    # closed surface: every edge shared by exactly two faces
    e = np.concatenate([m.faces[:, [0, 1]], m.faces[:, [1, 2]], m.faces[:, [2, 0]]])
    key = np.sort(e, axis=1)
    _, counts = np.unique(key[:, 0] * (len(m.vertices) + 1) + key[:, 1],
                          return_counts=True)
    assert np.all(counts == 2)
    # outward orientation: signed volume positive and close to the fill
    v = m.vertices[m.faces]
    vol = np.einsum("ij,ij->i", np.cross(v[:, 0], v[:, 1]), v[:, 2]).sum() / 6.0
    assert abs(vol - grid.data.mean()) < 0.05  # unit box, fill fraction


def test_binvox_roundtrip(grid):
    buf = io.BytesIO()
    write_binvox(grid, buf)
    buf.seek(0)
    g2 = read_binvox(buf)
    np.testing.assert_array_equal(g2.data, grid.data)
    np.testing.assert_allclose(g2.loc, grid.loc, atol=1e-6)
    assert abs(g2.scale - grid.scale) < 1e-6


def test_binvox_roundtrip_random():
    rng = np.random.RandomState(3)
    g = VoxelGrid(rng.rand(8, 8, 8) > 0.5, loc=(0.1, -0.2, 0.3), scale=2.5)
    buf = io.BytesIO()
    write_binvox(g, buf)
    buf.seek(0)
    g2 = read_binvox(buf)
    np.testing.assert_array_equal(g2.data, g.data)
    np.testing.assert_allclose(g2.loc, g.loc, atol=1e-5)


def test_long_run_encoding():
    # an all-empty 16^3 grid has a 4096-voxel run > 255: must chunk
    g = VoxelGrid(np.zeros((16, 16, 16), bool))
    buf = io.BytesIO()
    write_binvox(g, buf)
    buf.seek(0)
    assert not read_binvox(buf).data.any()

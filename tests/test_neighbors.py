"""CellNeighborhood: the dense-path sub-grid index must be byte-for-byte
identical to the naive vectorized scan (same indices, same order, same
distance bits) — it backs the SCT-family kernels whose oracles assume
naive-scan semantics (reference KD-tree radius query, src/util.cpp:238-268).
"""

import numpy as np
import pytest

from titanlib_spark.operators._neighbors import CellNeighborhood


def _pair(pts, ids, radius, num_max):
    """(naive, grid) indexes over the same data."""
    naive = CellNeighborhood(pts, ids, radius, num_max, dense_threshold=10**9)
    grid = CellNeighborhood(pts, ids, radius, num_max, dense_threshold=0)
    assert naive._grid is None
    assert grid._grid is not None
    return naive, grid


def _assert_identical(naive, grid, n, sample=None):
    rng = np.random.default_rng(7)
    centroids = range(n) if sample is None else rng.choice(n, sample, False)
    for c in centroids:
        gi, gd = naive.query(int(c))
        hi, hd = grid.query(int(c))
        np.testing.assert_array_equal(gi, hi)
        # bitwise: same elementwise expression on the same rows
        assert gd.tobytes() == hd.tobytes()


def test_random_cloud_truncated():
    rng = np.random.default_rng(42)
    n = 3000
    pts = rng.uniform(-1000.0, 1000.0, (n, 3))
    ids = rng.permutation(n).astype(np.int64)
    naive, grid = _pair(pts, ids, radius=150.0, num_max=10)
    _assert_identical(naive, grid, n, sample=300)


def test_random_cloud_uncapped():
    rng = np.random.default_rng(1)
    n = 2000
    pts = rng.uniform(0.0, 500.0, (n, 3))
    ids = np.arange(n, dtype=np.int64)
    naive, grid = _pair(pts, ids, radius=120.0, num_max=0)
    _assert_identical(naive, grid, n, sample=200)


def test_lattice_ties_break_by_id():
    """Regular lattice: many exactly-equal distances; the num_max cut must
    pick identical members via the (distance, id) lexsort on both paths."""
    g = np.arange(12, dtype=float)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], axis=1)
    n = len(pts)
    rng = np.random.default_rng(3)
    ids = rng.permutation(n).astype(np.int64)  # ids uncorrelated with rows
    naive, grid = _pair(pts, ids, radius=3.0, num_max=7)
    _assert_identical(naive, grid, n)


def test_surface_manifold_cluster():
    """Points on a 2D patch embedded in 3D (the ECEF case): the pitch
    heuristic assumes 3D occupancy, the correctness must not."""
    rng = np.random.default_rng(9)
    n = 4000
    lat = rng.uniform(0.0, 0.02, n)
    lon = rng.uniform(0.0, 0.02, n)
    R = 6.371e6
    pts = np.stack(
        [R * np.cos(lat) * np.cos(lon), R * np.cos(lat) * np.sin(lon),
         R * np.sin(lat)], axis=1)
    ids = np.arange(n, dtype=np.int64)
    naive, grid = _pair(pts, ids, radius=300.0, num_max=20)
    _assert_identical(naive, grid, n, sample=400)


def test_colocated_block_plus_spread():
    """Duplicate-location block (grid degenerate axis) mixed with spread
    points; also exercises empty-result centroids (radius tiny)."""
    rng = np.random.default_rng(5)
    dup = np.tile(np.array([[10.0, 10.0, 10.0]]), (50, 1))
    spread = rng.uniform(0.0, 20.0, (500, 3))
    pts = np.vstack([dup, spread])
    n = len(pts)
    ids = rng.permutation(n).astype(np.int64)
    naive, grid = _pair(pts, ids, radius=2.0, num_max=30)
    _assert_identical(naive, grid, n)


def test_all_colocated_grid_declines():
    """Zero extent: the grid builder declines (duplicate memo owns this)
    and the query falls through to the naive path."""
    pts = np.ones((100, 3))
    ids = np.arange(100, dtype=np.int64)
    nb = CellNeighborhood(pts, ids, 1.0, 5, dense_threshold=0)
    assert nb._grid is None
    gi, gd = nb.query(0)
    assert gi.size == 5 and np.all(gd == 0.0)

"""Wave 37: Hilbert curve kernel properties + decontamination invariants.

The query-level correctness is covered by the DuckDB oracles
(tools/check_oracles.py); these tests pin the kernel-level math the oracles
can't see: space-filling-curve axioms and cover exactness for arbitrary
boxes (not just the one box the query uses).
"""

import numpy as np
import pytest

from spatialindex_ray.kernels import geohash as ghk
from spatialindex_ray.kernels import hilbert as hbk

L = 6
N = 1 << L


@pytest.fixture(scope="module")
def full_grid():
    xs, ys = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()
    return xs, ys, hbk.hilbert_key(xs, ys, L)


def test_hilbert_bijective(full_grid):
    _, _, d = full_grid
    assert sorted(d.tolist()) == list(range(N * N))


def test_hilbert_consecutive_keys_are_grid_adjacent(full_grid):
    # THE Hilbert property (and what Morton lacks): |Δx| + |Δy| == 1
    # between every pair of consecutive keys
    xs, ys, d = full_grid
    order = np.argsort(d)
    step = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert (step == 1).all()


def test_hilbert_inverse_roundtrip(full_grid):
    xs, ys, d = full_grid
    ix, iy = hbk.hilbert_xy(d, L)
    assert (ix == xs).all() and (iy == ys).all()


def test_hilbert_cover_exact_on_random_boxes(full_grid):
    xs, ys, d = full_grid
    rng = np.random.default_rng(7)
    for _ in range(100):
        a, b = sorted(rng.integers(0, N, 2).tolist())
        c, e = sorted(rng.integers(0, N, 2).tolist())
        rgs = hbk.hilbert_cover(a, b, c, e, L)
        # ranges sorted, disjoint, coalesced
        assert (np.diff(rgs[:, 0]) > 0).all()
        assert (rgs[1:, 0] > rgs[:-1, 1] + 1).all()
        inbox = (xs >= a) & (xs <= b) & (ys >= c) & (ys <= e)
        got = (
            np.concatenate([np.arange(lo, hi + 1) for lo, hi in rgs])
            if len(rgs)
            else np.array([], dtype=np.int64)
        )
        assert np.array_equal(np.sort(got), np.sort(d[inbox]))


def test_hilbert_cover_fewer_ranges_than_morton():
    # the reason this family exists: same box, fewer contiguous ranges
    h = len(hbk.hilbert_cover(5, 40, 9, 33, L))
    z = len(ghk.zorder_cover(5, 40, 9, 33, L))
    assert h < z


def test_hilbert_cover_degenerate():
    assert len(hbk.hilbert_cover(3, 3, 3, 3, L)) == 1
    assert hbk.hilbert_cover(10, 5, 0, 63, L).shape == (0, 2)
    full = hbk.hilbert_cover(0, N - 1, 0, N - 1, L)
    assert full.tolist() == [[0, N * N - 1]]

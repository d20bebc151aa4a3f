"""The tiled earlier-dup rule must equal the naive (N, N) triu decision
matrix bit-for-bit — same float64 dots, any tile boundary."""

import numpy as np

import __ray_entry__ as entry


def _naive(V, tau):
    S = V @ V.T
    return (np.triu(S, 1) >= tau).any(axis=0)


def test_tiled_dup_matches_naive_across_boundaries():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(9000, 8))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    for tau in (0.2, 0.45, 0.9):
        a = entry._tiled_earlier_dup(V, tau)  # crosses 4096 boundaries
        b = _naive(V, tau)
        assert (a == b).all()


def test_tiled_dup_tiny_blocks():
    rng = np.random.default_rng(4)
    V = rng.normal(size=(101, 4))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    a = entry._tiled_earlier_dup(V, 0.3, block=7)
    assert (a == _naive(V, 0.3)).all()


def test_tiled_dup_counts_dup_predecessors():
    # the SemDeDup rule prunes against ANY lower-id vector, including ones
    # that were themselves pruned: a chain v0~v1, v1~v2 (v0 !~ v2) must
    # drop BOTH v1 and v2
    v0 = np.array([1.0, 0.0])
    v1 = np.array([np.cos(0.6), np.sin(0.6)])
    v2 = np.array([np.cos(1.2), np.sin(1.2)])
    V = np.stack([v0, v1, v2])
    tau = np.cos(0.7)  # v0.v1 and v1.v2 qualify; v0.v2 does not
    dup = entry._tiled_earlier_dup(V, tau)
    assert dup.tolist() == [False, True, True]

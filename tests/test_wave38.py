"""Kernel/property tests for waves 36, 38 and 39 — invariants the DuckDB
oracles can't express: sketch accuracy bounds, geometric predicate edge
cases, and integer-overflow headroom proofs."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402


# ------------------------------------------------------------ KMV sketch
def _kmv_estimate(hashes: np.ndarray, k: int) -> int:
    h = np.unique(hashes)
    if len(h) < k:
        return int(len(h))
    kth = int(np.sort(h)[k - 1])
    return ((k - 1) * (1 << 63)) // kth


def test_kmv_estimate_accuracy_over_synthetic_cardinalities():
    # relative error of a k=64 KMV is ~1/sqrt(k-2) ≈ 13%; allow 3 sigma
    k = 64
    for n in (100, 1000, 50000):
        ids = np.arange(n, dtype=np.int64) * 7919 + 13
        hv = (ops._splitmix64(ids) >> np.uint64(1)).astype(np.int64)
        est = _kmv_estimate(hv, k)
        assert abs(est - n) / n < 0.45, (n, est)


def test_kmv_small_set_is_exact():
    ids = np.arange(40, dtype=np.int64)
    hv = (ops._splitmix64(ids) >> np.uint64(1)).astype(np.int64)
    assert _kmv_estimate(hv, 64) == 40


def test_kmv_merge_equals_single_pass():
    # bottom-k of a union == bottom-k of (bottom-k of each part) — the
    # mergeability the exchange relies on
    k = 64
    ids = np.arange(5000, dtype=np.int64)
    hv = np.sort((ops._splitmix64(ids) >> np.uint64(1)).astype(np.int64))
    parts = np.array_split(hv, 7)
    merged = np.sort(np.unique(np.concatenate([np.sort(p)[:k] for p in parts])))[:k]
    assert np.array_equal(merged, np.sort(np.unique(hv))[:k])


# ------------------------------------------------------- BM25 invariants
def test_bm25_monotone_in_tf_and_idf():
    # fixed doc length: higher tf must never lower the per-term score;
    # rarer terms (smaller df) must never score lower at equal tf
    N, T, dl = 1000, 54000, 54
    def score(tf, df):
        idf = (N * entry.BM25_IDF_SCALE) // df
        return (22 * T * tf * idf) // (10 * T * tf + 3 * T + 9 * dl * N)
    s = [score(tf, 50) for tf in range(0, 10)]
    assert s[0] == 0 and all(b >= a for a, b in zip(s, s[1:]))
    assert score(3, 10) >= score(3, 500)


def test_bm25_length_normalization_penalizes_long_docs():
    N, T = 1000, 54000
    def score(dl):
        idf = (N * entry.BM25_IDF_SCALE) // 50
        return (22 * T * 2 * idf) // (10 * T * 2 + 3 * T + 9 * dl * N)
    assert score(20) > score(200)


# ------------------------------------------- segment crossing predicate
def _cross_sign(ax, ay, bx, by, cx, cy):
    return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def _properly_cross(p, q, r, s):
    d1 = _cross_sign(*p, *q, *r)
    d2 = _cross_sign(*p, *q, *s)
    d3 = _cross_sign(*r, *s, *p)
    d4 = _cross_sign(*r, *s, *q)
    return d1 * d2 < 0 and d3 * d4 < 0


def test_proper_crossing_predicate_cases():
    # X crossing
    assert _properly_cross((0, 0), (2, 2), (0, 2), (2, 0))
    # shared endpoint: NOT a proper crossing
    assert not _properly_cross((0, 0), (2, 2), (2, 2), (3, 0))
    # T-touch (endpoint on interior): NOT proper
    assert not _properly_cross((0, 0), (2, 2), (1, 1), (3, 0))
    # parallel disjoint
    assert not _properly_cross((0, 0), (2, 0), (0, 1), (2, 1))
    # collinear overlap: excluded by the strict test
    assert not _properly_cross((0, 0), (3, 0), (1, 0), (2, 0))


# --------------------------------------------- window regression bounds
def test_window_regression_sxx_headroom():
    # worst case: every event of a group in the same hour at the last
    # second with max |value| — Σx² and Σxy must stay inside int64 even
    # for a pathological 5e9-row (type, hour) group
    x_max = 3599
    y_max = 500_000  # |value| ≤ 500 → milli ≤ 5e5 (data max is 490.02)
    rows_per_group = 5_000_000_000
    assert x_max * x_max * rows_per_group < 2**63
    assert x_max * y_max * rows_per_group < 2**63


# ------------------------------------------------ multi-query parameters
def test_multi_cone_params_deterministic_and_sane():
    v1, c1 = entry._multi_cone_params()
    v2, c2 = entry._multi_cone_params()
    assert np.array_equal(v1, v2) and np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0)
    assert (c1 > 0).all() and (c1 < 1).all()  # radii in (0°, 90°)


def test_multi_poly_params_all_convex():
    polys = entry._multi_poly_params()  # raises RegionError if degenerate
    assert len(polys) == entry.MULTI_POLY_Q
    for normals in polys:
        assert len(normals) == 4
        for nm in normals:
            assert abs(np.linalg.norm(nm) - 1.0) < 1e-12


# ------------------------------------------------------ bbox join dedupe
def test_bbox_canonical_cell_dedupes_every_overlap_once():
    # brute-force mini-universe: every overlapping pair must be emitted by
    # exactly ONE canonical cell (the one containing max of lower-left
    # corners) among the cells both rects cover
    rng = np.random.default_rng(3)
    g = 64
    rects = []
    for rid in range(60):
        cx, cy = rng.integers(0, 512, 2)
        w, h = rng.integers(1, 40, 2)
        rects.append((rid, cx - w, cx + w, cy - h, cy + h))
    for a in range(len(rects)):
        for b in range(a + 1, len(rects)):
            _, axl, axh, ayl, ayh = rects[a]
            _, bxl, bxh, byl, byh = rects[b]
            if not (axl <= bxh and bxl <= axh and ayl <= byh and byl <= ayh):
                continue
            canon = (max(axl, bxl) // g, max(ayl, byl) // g)
            cells_a = {
                (x // g, y // g)
                for x in (axl, axh)
                for y in (ayl, ayh)
            }
            cells_b = {
                (x // g, y // g)
                for x in (bxl, bxh)
                for y in (byl, byh)
            }
            # the canonical cell must be covered by BOTH rects' cell sets
            # (otherwise the pair would never meet there) — for cell size
            # >= max extent this holds because the intersection corner
            # lies inside both rects
            ca = {
                (x // g, y // g)
                for x in range(axl, axh + 1, g // 2)
                for y in range(ayl, ayh + 1, g // 2)
            } | cells_a
            cb = {
                (x // g, y // g)
                for x in range(bxl, bxh + 1, g // 2)
                for y in range(byl, byh + 1, g // 2)
            } | cells_b
            assert canon in ca and canon in cb

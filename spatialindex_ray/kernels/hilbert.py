"""Hilbert space-filling curve: vectorized 2-D encode + box range cover.

Fifth curve/cell family next to HTM, HEALPix, geohash/Morton and S2. The
Hilbert curve improves on Morton (geohash.py) for range queries because
consecutive keys are always grid-adjacent — a box decomposes into fewer,
longer key ranges, which matters when the key is the sort/partition column
of a 100-TB table (fewer ranges = fewer row-group seeks per query).

Algorithm: the classic bit-interleave walk (Hilbert 1891 construction as
popularized in Warren, "Hacker's Delight" and the public-domain Wikipedia
xy2d/d2xy routines), formulated with explicit low-bit masking at every
scale so each step is a pure function of the remaining bits — this exact
formulation is mirrored bit-for-bit by the recursive-CTE SQL dual in
__ray_entry__ (the oracle re-walks the same loop in DuckDB).

All functions are driver-safe (cover: runs once per query, output is a
small (R, 2) range table broadcast to every batch) or fully vectorized
numpy (encode: no Python loop over rows, one pass per bit level).
"""

from __future__ import annotations

import numpy as np

# curve-order position k -> quadrant bits (rx, ry); inverse of (3*rx)^ry
_QUAD_OF_K = ((0, 0), (0, 1), (1, 1), (1, 0))


def hilbert_key(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Vectorized xy -> Hilbert d at `level` (grid is 2^level x 2^level).

    Per bit scale s (high to low): extract quadrant bits, accumulate
    s*s*((3*rx)^ry), mask to lower bits, then flip+swap the local frame
    when ry==0 (flip only when rx==1). Returns int64 in [0, 4^level).
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    for k in range(level - 1, -1, -1):
        s = np.int64(1) << np.int64(k)
        rx = (x >> np.int64(k)) & np.int64(1)
        ry = (y >> np.int64(k)) & np.int64(1)
        d += s * s * ((np.int64(3) * rx) ^ ry)
        x &= s - np.int64(1)
        y &= s - np.int64(1)
        # frame rotation: only where ry == 0
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x_new = np.where(swap, yf, xf)
        y_new = np.where(swap, xf, yf)
        x, y = x_new, y_new
    return d


def hilbert_xy(d: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse: Hilbert d -> (x, y) at `level` (low to high)."""
    d = np.asarray(d, dtype=np.int64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    for k in range(level):
        s = np.int64(1) << np.int64(k)
        q = (d >> np.int64(2 * k)) & np.int64(3)
        rx = np.where((q == 2) | (q == 3), np.int64(1), np.int64(0))
        ry = np.where((q == 1) | (q == 2), np.int64(1), np.int64(0))
        # undo the encode-side rotation on the bits accumulated so far
        flip = (ry == 0) & (rx == 1)
        xs = np.where(ry == 0, y, x)
        ys = np.where(ry == 0, x, y)
        xs2 = np.where(flip, s - 1 - xs, xs)
        ys2 = np.where(flip, s - 1 - ys, ys)
        x = xs2 + s * rx
        y = ys2 + s * ry
    return x, y


def hilbert_cover(
    i_lo: int, i_hi: int, j_lo: int, j_hi: int, level: int
) -> np.ndarray:
    """Decompose the inclusive cell rectangle [i_lo,i_hi]x[j_lo,j_hi] at
    `level` into maximal Hilbert key ranges (quadtree descent — the Hilbert
    analog of geohash.zorder_cover / the HTM/HPX covers in cover.py).

    Every quadtree node occupies one CONTIGUOUS Hilbert key interval, so
    the descent recurses in curve order, re-expressing the query box in
    each child's canonical frame (the same flip+swap as hilbert_key, applied
    to the rectangle's corners — a rectangle stays a rectangle under the
    dihedral transform). Returns a sorted (R, 2) int64 array of inclusive
    [lo, hi] ranges, adjacent ranges coalesced. Driver-side planning only.
    """
    ranges: list[tuple[int, int]] = []

    def rec(bx0: int, bx1: int, by0: int, by1: int, size: int, d0: int):
        # box given in the node's LOCAL canonical coords, already clipped
        # to [0, size)^2 and non-empty
        if bx0 == 0 and by0 == 0 and bx1 == size - 1 and by1 == size - 1:
            ranges.append((d0, d0 + size * size - 1))
            return
        half = size // 2
        for k, (rx, ry) in enumerate(_QUAD_OF_K):
            qx0, qy0 = rx * half, ry * half
            cx0 = max(bx0, qx0) - qx0
            cx1 = min(bx1, qx0 + half - 1) - qx0
            cy0 = max(by0, qy0) - qy0
            cy1 = min(by1, qy0 + half - 1) - qy0
            if cx0 > cx1 or cy0 > cy1:
                continue
            # child canonical frame: flip when (rx=1, ry=0), swap when ry=0
            if ry == 0:
                if rx == 1:
                    cx0, cx1 = half - 1 - cx1, half - 1 - cx0
                    cy0, cy1 = half - 1 - cy1, half - 1 - cy0
                cx0, cy0 = cy0, cx0
                cx1, cy1 = cy1, cx1
            rec(cx0, cx1, cy0, cy1, half, d0 + k * half * half)

    n = 1 << level
    bx0, bx1 = max(i_lo, 0), min(i_hi, n - 1)
    by0, by1 = max(j_lo, 0), min(j_hi, n - 1)
    if bx0 > bx1 or by0 > by1:
        return np.empty((0, 2), dtype=np.int64)
    rec(bx0, bx1, by0, by1, n, 0)
    if not ranges:
        return np.empty((0, 2), dtype=np.int64)
    arr = np.array(sorted(ranges), dtype=np.int64)
    keep = [0]
    for r in range(1, len(arr)):
        if arr[r, 0] == arr[keep[-1], 1] + 1:
            arr[keep[-1], 1] = arr[r, 1]
        else:
            keep.append(r)
    return arr[keep]

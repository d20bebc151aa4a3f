"""Geohash + Z-order (Morton) curve kernels — the third curve family next to
HTM trixels (kernels/htm.py) and HEALPix nested cells (kernels/healpix.py).

Public construction only (Niemeyer's geohash: interleave longitude/latitude
bisection bits, base-32 alphabet '0123456789bcdefghjkmnpqrstuvwxyz'); the
reference library has no geohash, this extends the engine's cell-id surface
the same way S2 (kernels/s2.py) does.

Encoding is defined CLOSED-FORM (floor of the scaled coordinate) rather than
by iterative bisection so the exact same arithmetic is expressible in SQL:

    lon' = lon - 360 if lon >= 180 else lon          (engine lon is [0, 360))
    lonb = min(floor((lon' + 180) / 360 * 2^ceil(5P/2)), 2^ceil(5P/2) - 1)
    latb = min(floor((lat  +  90) / 180 * 2^floor(5P/2)), 2^floor(5P/2) - 1)

then bits interleave lon-first (geohash convention) into 5P bits and map to
P base-32 characters.  All float ops are IEEE double with the literal
operation order above, so a DuckDB dual re-walking the encoder matches
bit-for-bit (see GEOHASH SQL builders in __ray_entry__.py).
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32 = np.frombuffer(BASE32.encode(), dtype=np.uint8)


def _spread_bits(v: np.ndarray, n: int) -> np.ndarray:
    """Spread the low n bits of v so bit i lands at position 2i (uint64)."""
    v = v.astype(np.uint64)
    out = np.zeros_like(v)
    for i in range(n):
        out |= ((v >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
    return out


def geohash_bits(lon: np.ndarray, lat: np.ndarray, precision: int) -> np.ndarray:
    """5*precision-bit interleaved geohash integer (lon bit first)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon_g = np.where(lon >= 180.0, lon - 360.0, lon)
    lonb = np.floor((lon_g + 180.0) / 360.0 * float(1 << nlon)).astype(np.int64)
    latb = np.floor((lat + 90.0) / 180.0 * float(1 << nlat)).astype(np.int64)
    lonb = np.minimum(np.maximum(lonb, 0), (1 << nlon) - 1)
    latb = np.minimum(np.maximum(latb, 0), (1 << nlat) - 1)
    # lon occupies the odd (higher) interleave slots when nlon == nlat,
    # and additionally the very top bit when nbits is odd.
    code = (_spread_bits(lonb.astype(np.uint64), nlon) << np.uint64(1)) | _spread_bits(
        latb.astype(np.uint64), nlat
    )
    if nbits % 2 == 1:
        # odd total: lon has one extra bit; the interleave above placed lon
        # bit j at position 2j+1 which overshoots — rebuild explicitly.
        code = np.zeros(len(lonb), dtype=np.uint64)
        for b in range(nbits):
            # bit (nbits-1-b) of the code, MSB-first alternation lon,lat,...
            src = lonb if b % 2 == 0 else latb
            srcbit = (nlon - 1 - b // 2) if b % 2 == 0 else (nlat - 1 - b // 2)
            code |= ((src.astype(np.uint64) >> np.uint64(srcbit)) & np.uint64(1)) << np.uint64(
                nbits - 1 - b
            )
    return code.astype(np.int64)


def geohash_strings(lon: np.ndarray, lat: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized geohash strings as a fixed-width numpy unicode array
    (one uint8 gather per character position, no per-row Python)."""
    code = geohash_bits(lon, lat, precision).astype(np.uint64)
    chars = np.empty((len(code), precision), dtype=np.uint8)
    for c in range(precision):
        idx = (code >> np.uint64(5 * (precision - 1 - c))) & np.uint64(31)
        chars[:, c] = _B32[idx.astype(np.int64)]
    return chars.view(f"S{precision}").reshape(-1).astype(str)


# --------------------------------------------------------------- Z-order
def morton_key(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """2*level-bit Morton (Z-order) key over the [0,360) x [-90,90] grid:
    cell coords i = floor(lon/360 * 2^level), j = floor((lat+90)/180 * 2^level)
    clamped, bits interleaved lon-high (bit 2k+1 = lon bit k)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    i = np.floor(lon / 360.0 * float(1 << level)).astype(np.int64)
    j = np.floor((lat + 90.0) / 180.0 * float(1 << level)).astype(np.int64)
    i = np.minimum(np.maximum(i, 0), (1 << level) - 1)
    j = np.minimum(np.maximum(j, 0), (1 << level) - 1)
    return (
        (_spread_bits(i.astype(np.uint64), level) << np.uint64(1))
        | _spread_bits(j.astype(np.uint64), level)
    ).astype(np.int64)


def _spread_bits3(v: np.ndarray, n: int) -> np.ndarray:
    """Insert two zero bits between the low n bits of v (3-D Morton lane)."""
    out = np.zeros_like(v, dtype=np.uint64)
    for b in range(n):
        out |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b)
    return out


def morton3_key(i: np.ndarray, j: np.ndarray, k: np.ndarray, level: int) -> np.ndarray:
    """3*level-bit 3-D Morton key over integer cell coords already in
    [0, 2^level): bits interleave i-high (bit 3b+2 = i bit b, 3b+1 = j bit
    b, 3b = k bit b) — the spatiotemporal (lon, lat, day) curve."""
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    k = np.asarray(k, dtype=np.uint64)
    return (
        (_spread_bits3(i, level) << np.uint64(2))
        | (_spread_bits3(j, level) << np.uint64(1))
        | _spread_bits3(k, level)
    ).astype(np.int64)


def zorder3_cover(
    lo: tuple, hi: tuple, level: int
) -> np.ndarray:
    """Decompose the inclusive integer box [lo, hi] (3-tuples of cell
    coords) at `level` into maximal aligned 3-D Morton key ranges (octree
    descent — the 3-D analog of zorder_cover). Returns sorted coalesced
    (R, 2) int64 inclusive [lo, hi] key ranges. Driver-side planning only."""
    (i_lo, j_lo, k_lo), (i_hi, j_hi, k_hi) = lo, hi
    ranges: list[tuple[int, int]] = []

    def rec(i0: int, j0: int, k0: int, size: int, prefix: int):
        i1, j1, k1 = i0 + size - 1, j0 + size - 1, k0 + size - 1
        if (
            i1 < i_lo or i0 > i_hi
            or j1 < j_lo or j0 > j_hi
            or k1 < k_lo or k0 > k_hi
        ):
            return
        if (
            i0 >= i_lo and i1 <= i_hi
            and j0 >= j_lo and j1 <= j_hi
            and k0 >= k_lo and k1 <= k_hi
        ):
            span = size * size * size
            ranges.append((prefix, prefix + span - 1))
            return
        half = size // 2
        sub = half * half * half
        # octant order == key order: (i_bit, j_bit, k_bit) in 000..111
        for oi in range(2):
            for oj in range(2):
                for ok in range(2):
                    rec(
                        i0 + oi * half,
                        j0 + oj * half,
                        k0 + ok * half,
                        half,
                        prefix + ((oi << 2) | (oj << 1) | ok) * sub,
                    )

    rec(0, 0, 0, 1 << level, 0)
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


def zorder_cover(i_lo: int, i_hi: int, j_lo: int, j_hi: int, level: int) -> np.ndarray:
    """Decompose the inclusive integer cell rectangle [i_lo,i_hi]x[j_lo,j_hi]
    at `level` into maximal aligned Z-order key ranges (quadtree descent —
    the Morton analog of the HTM/HPX covers in cover.py). Returns a sorted
    (R, 2) int64 array of inclusive [lo, hi] key ranges; coalesces adjacent
    ranges. Driver-side planning only (runs once per query)."""
    ranges: list[tuple[int, int]] = []

    def rec(i0: int, j0: int, size: int, prefix: int):
        i1, j1 = i0 + size - 1, j0 + size - 1
        if i1 < i_lo or i0 > i_hi or j1 < j_lo or j0 > j_hi:
            return
        if i0 >= i_lo and i1 <= i_hi and j0 >= j_lo and j1 <= j_hi:
            span = size * size
            ranges.append((prefix, prefix + span - 1))
            return
        half = size // 2
        # quadrant order == key order: (i_hi_bit, j_hi_bit) in 00,01,10,11
        rec(i0, j0, half, prefix)
        rec(i0, j0 + half, half, prefix + half * half)
        rec(i0 + half, j0, half, prefix + 2 * half * half)
        rec(i0 + half, j0 + half, half, prefix + 3 * half * half)

    rec(0, 0, 1 << level, 0)
    if not ranges:
        return np.empty((0, 2), dtype=np.int64)
    arr = np.array(sorted(ranges), dtype=np.int64)
    # coalesce touching ranges
    keep = [0]
    for r in range(1, len(arr)):
        if arr[r, 0] == arr[keep[-1], 1] + 1:
            arr[keep[-1], 1] = arr[r, 1]
        else:
            keep.append(r)
    return arr[keep]

"""Vectorized S2 cell-id kernels (from scratch, public S2 geometry scheme).

The S2 library's cell decomposition (published by Google, s2geometry.io):
unit sphere -> 6 cube faces -> quadratic s/t projection -> 2^30 x 2^30 leaf
grid per face -> Hilbert space-filling curve ordering. A 64-bit cell id is
[3 face bits][2k Hilbert position bits][1 marker bit][zeros]; cells at level
L are prefixes of the leaf ids, so every cell owns one contiguous leaf-id
range — the same sorted-range query pattern as HTM/HEALPix (north_star asks
for H3/S2 alongside them).

Everything is NumPy-vectorized: face selection and projection are
elementwise; the Hilbert encoding processes 4 ij-bits per iteration through
the standard position/orientation lookup tables (8 iterations total for all
points at once).

No external S2 library exists in this environment; correctness is covered
by roundtrip property tests (encode -> cell center -> re-encode), structure
tests (parent prefixes, range nesting), and the DuckDB-oracled
``cone_search_s2`` query in __ray_entry__.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP = 1  # swap i and j
_INVERT = 2  # invert i and j

# kPosToOrientation / kPosToIJ — the canonical S2 Hilbert curve tables.
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.int64)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # orientation 0
        [0, 2, 3, 1],  # orientation swap
        [3, 2, 0, 1],  # orientation invert
        [3, 1, 0, 2],  # orientation swap+invert
    ],
    dtype=np.int64,
)

# 4-bit lookup tables: (ij << 2) | orientation  ->  (pos << 2) | orientation
# and the inverse. Built once by the standard recursive initialization.
_LOOKUP_BITS = 4
_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level, i, j, orig_orient, pos, orient):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for index in range(4):
        _init_lookup(
            level,
            i + (int(r[index]) >> 1),
            j + (int(r[index]) & 1),
            orig_orient,
            pos + index,
            orient ^ int(_POS_TO_ORIENT[index]),
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def xyz_to_face_uv(x, y, z):
    """(face, u, v) of each point — s2coords GetFace / ValidFaceXYZtoUV."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0.0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (un, ud, vn, vd) in enumerate(
        [
            (1, 0, 2, 0),   # face 0: u=y/x,  v=z/x
            (0, 1, 2, 1),   # face 1: u=-x/y, v=z/y
            (0, 2, 1, 2),   # face 2: u=-x/z, v=-y/z
            (2, 0, 1, 0),   # face 3: u=z/x,  v=y/x
            (2, 1, 0, 1),   # face 4: u=z/y,  v=-x/y
            (1, 2, 0, 2),   # face 5: u=-y/z, v=-x/z
        ]
    ):
        m = face == f
        if not m.any():
            continue
        comps = (x, y, z)
        num_u = comps[un][m]
        num_v = comps[vn][m]
        den = comps[ud][m]
        su = -1.0 if f in (1, 2, 5) else 1.0
        sv = -1.0 if f in (2, 4, 5) else 1.0
        u[m] = su * num_u / den
        v[m] = sv * num_v / den
    return face.astype(np.int64), u, v


def uv_to_st(u):
    """S2's quadratic projection (S2_QUADRATIC_PROJECTION). sqrt(1 + 3|u|)
    form keeps both np.where branches finite (identical values)."""
    r = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, r, 1.0 - r)


def st_to_uv(s):
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s):
    return np.clip((np.floor((1 << MAX_LEVEL) * s)).astype(np.int64), 0,
                   (1 << MAX_LEVEL) - 1)


def face_ij_to_cellid(face, i, j, level=MAX_LEVEL):
    """Leaf cell id from (face, i, j), truncated to ``level`` — vectorized
    port of the standard lookup-table Hilbert encoding (S2CellId::FromFaceIJ).
    Returns uint64 (canonical S2 ids use the full 64-bit unsigned space:
    face ``<< 61`` sets bit 63 for faces 4-5)."""
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    n = face << np.uint64(60)
    bits = (face & np.uint64(_SWAP)).astype(np.int64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        ib = ((i >> np.uint64(k * _LOOKUP_BITS)) & mask).astype(np.int64)
        jb = ((j >> np.uint64(k * _LOOKUP_BITS)) & mask).astype(np.int64)
        bits = _lookup_pos[(((ib << _LOOKUP_BITS) + jb) << 2) + bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP + _INVERT
    leaf = n * np.uint64(2) + np.uint64(1)
    if level >= MAX_LEVEL:
        return leaf
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (leaf & ~(lsb - np.uint64(1))) | lsb


def cellid_from_xyz(xyz: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """(N, 3) unit vectors -> uint64 S2 cell ids at ``level``."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return face_ij_to_cellid(face, i, j, level)


def _lsb(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids & (~ids + np.uint64(1))


def cellid_level(ids: np.ndarray) -> np.ndarray:
    """Level of each cell id (position of the lowest set bit)."""
    v = _lsb(ids)
    out = np.zeros(len(v), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        out[m] += shift
        v[m] >>= np.uint64(shift)
    return MAX_LEVEL - out // 2


def cellid_range(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[min_leaf, max_leaf] contained-leaf range of each cell id."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = _lsb(ids)
    return ids - lsb + np.uint64(1), ids + lsb - np.uint64(1)


def cellid_to_face_ij(ids: np.ndarray):
    """Inverse Hilbert decode: (face, i, j, orientation) of each cell id
    (S2CellId::ToFaceIJOrientation), vectorized 4 bits per iteration."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    bits = (face & _SWAP).astype(np.int64)
    i = np.zeros(len(ids), dtype=np.int64)
    j = np.zeros(len(ids), dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = _LOOKUP_BITS - 2 if k == 7 else _LOOKUP_BITS
        pos_bits = (
            (ids >> np.uint64(k * 2 * _LOOKUP_BITS + 1))
            & np.uint64((1 << (2 * nbits)) - 1)
        ).astype(np.int64)
        bits += pos_bits << 2
        bits = _lookup_ij[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP + _INVERT
    return face, i, j, bits


_FACE_TO_XYZ = [
    # face -> lambda (u, v) -> (x, y, z): inverse of xyz_to_face_uv
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (v, u, -np.ones_like(u)),
]


def face_uv_to_xyz(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        xf, yf, zf = _FACE_TO_XYZ[f](u[m], v[m])
        x[m], y[m], z[m] = xf, yf, zf
    n = np.sqrt(x * x + y * y + z * z)
    return np.column_stack([x / n, y / n, z / n])


def _aligned_min_ij(ids: np.ndarray):
    """(face, i_min, j_min, size): the Hilbert decode of a non-leaf id lands
    on an interior leaf; mask to the cell's aligned size x size ij block."""
    ids = np.asarray(ids, dtype=np.int64)
    face, i, j, _ = cellid_to_face_ij(ids)
    lev = cellid_level(ids)
    size = np.int64(1) << (np.int64(MAX_LEVEL) - lev)
    return face, i & ~(size - 1), j & ~(size - 1), size


def cellid_to_center_xyz(ids: np.ndarray) -> np.ndarray:
    """Unit-vector centers of cells (any mix of levels)."""
    face, i, j, size = _aligned_min_ij(ids)
    s = (2.0 * i + size) / float(2 << MAX_LEVEL)
    t = (2.0 * j + size) / float(2 << MAX_LEVEL)
    return face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))


def cell_corners_xyz(ids: np.ndarray) -> np.ndarray:
    """(N, 4, 3) unit-vector corners of each cell."""
    face, i, j, size = _aligned_min_ij(ids)
    out = np.empty((len(ids), 4, 3))
    denom = float(1 << MAX_LEVEL)
    for c, (di, dj) in enumerate([(0, 0), (1, 0), (1, 1), (0, 1)]):
        s = (i + di * size) / denom
        t = (j + dj * size) / denom
        out[:, c, :] = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    return out


def cap_cover_ranges(center_xyz, radius_rad: float, level: int) -> np.ndarray:
    """Sorted (R, 2) leaf-id ranges of the level-``level`` cells possibly
    intersecting the spherical cap — a BFS from the 6 face cells keeping
    cells whose bounding cap (center + max corner angle, computed exactly
    per cell) intersects the query cap. Conservative superset, suitable as
    the index pre-filter before the exact predicate."""
    c = np.asarray(center_xyz, dtype=np.float64)
    ids = face_ij_to_cellid(
        np.arange(6, dtype=np.int64),
        np.full(6, 1 << (MAX_LEVEL - 1), dtype=np.int64),
        np.full(6, 1 << (MAX_LEVEL - 1), dtype=np.int64),
        0,
    )
    emitted = []  # cells fully inside the cap, emitted at their own level
    for lev in range(0, level + 1):
        centers = cellid_to_center_xyz(ids)
        corners = cell_corners_xyz(ids)
        cosang = np.einsum("nkj,nj->nk", corners, centers)
        circum = np.arccos(np.clip(cosang.min(axis=1), -1.0, 1.0))
        d = np.arccos(np.clip(centers @ c, -1.0, 1.0))
        keep = d <= radius_rad + circum
        if lev == level:
            emitted.append(ids[keep])
            break
        # fully-inside cells need no subdivision: their whole leaf range is
        # in the cover regardless of level
        inside = keep & (d + circum <= radius_rad)
        if inside.any():
            emitted.append(ids[inside])
        ids = ids[keep & ~inside]
        if len(ids) == 0:
            break
        # children: 4 per cell (parent center +- odd multiples of child lsb)
        child_lsb = _lsb(ids) >> np.uint64(2)
        ids = np.stack(
            [
                ids - np.uint64(3) * child_lsb,
                ids - child_lsb,
                ids + child_lsb,
                ids + np.uint64(3) * child_lsb,
            ],
            axis=1,
        ).ravel()
    ids = (
        np.concatenate(emitted) if emitted else np.empty(0, dtype=np.uint64)
    )
    if len(ids) == 0:
        return np.empty((0, 2), dtype=np.uint64)
    lo, hi = cellid_range(np.sort(ids))
    # merge adjacent ranges
    out = []
    cur_lo, cur_hi = int(lo[0]), int(hi[0])
    for a, b in zip(lo[1:], hi[1:]):
        if int(a) <= cur_hi + 1:
            cur_hi = max(cur_hi, int(b))
        else:
            out.append([cur_lo, cur_hi])
            cur_lo, cur_hi = int(a), int(b)
    out.append([cur_lo, cur_hi])
    return np.array(out, dtype=np.uint64)

"""Aperture-7 icosahedral hexagonal grid (H3-style), vectorized NumPy.

The north_star asks for an H3-class hexagonal index alongside HTM/HEALPix/S2.
This implements the same published construction H3 uses — icosahedron faces,
gnomonic projection, hexagonal lattice with aperture-7 refinement (each finer
resolution scales the lattice by sqrt(7) and rotates it by
asin(sqrt(3/28)) ~= 19.1066 deg, alternating Class II/III) — with one honest
deviation, documented here:

  Canonical H3 cell ids depend on the library's 122-base-cell numbering and
  the (face, i, j, k) -> base-cell lookup tables, which are published DATA
  (baseCells.c), not algorithm; they cannot be re-derived from first
  principles nor fetched in this offline environment. Instead, cells here
  are keyed (res, face, i, j) with axial lattice coordinates on the face the
  point projects to (max-dot face selection). Interior hexagons are exact
  hexagons; hexagons straddling an icosahedron edge are CLIPPED at the face
  boundary (each face owns its own lattice). The result is a deterministic
  total partition of the sphere into hexagon-cells at 16 resolutions —
  equivalent engine semantics (multi-resolution hex binning, density
  aggregation, neighbor smoothing) with non-canonical ids.

Cell id layout (uint64): [4 bits res][5 bits face][27 bits i+OFF][27 bits j+OFF].
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
_ROT = float(np.arcsin(np.sqrt(3.0 / 28.0)))  # aperture-7 rotation per res
_SQRT7 = np.sqrt(7.0)
# base lattice scale: res-0 hexagon circumradius ~ half the face inradius,
# so a face holds a handful of res-0 cells (H3 has ~6 per face)
_RES0_SCALE = 0.35
_OFF = np.int64(1 << 26)
_MASK27 = np.uint64((1 << 27) - 1)

# ---------------------------------------------------------------- icosahedron
_PHI = (1.0 + np.sqrt(5.0)) / 2.0
_ICO_VERTS = np.array(
    [
        [-1, _PHI, 0], [1, _PHI, 0], [-1, -_PHI, 0], [1, -_PHI, 0],
        [0, -1, _PHI], [0, 1, _PHI], [0, -1, -_PHI], [0, 1, -_PHI],
        [_PHI, 0, -1], [_PHI, 0, 1], [-_PHI, 0, -1], [-_PHI, 0, 1],
    ],
    dtype=np.float64,
)
_ICO_VERTS /= np.linalg.norm(_ICO_VERTS, axis=1, keepdims=True)
_ICO_FACES = np.array(
    [
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ],
    dtype=np.int64,
)
_FACE_CENTERS = _ICO_VERTS[_ICO_FACES].sum(axis=1)
_FACE_CENTERS /= np.linalg.norm(_FACE_CENTERS, axis=1, keepdims=True)
# deterministic local tangent basis per face (e1 toward vertex 0, e2 = c x e1)
_E1 = _ICO_VERTS[_ICO_FACES[:, 0]] - (
    (_ICO_VERTS[_ICO_FACES[:, 0]] * _FACE_CENTERS).sum(axis=1, keepdims=True)
    * _FACE_CENTERS
)
_E1 /= np.linalg.norm(_E1, axis=1, keepdims=True)
_E2 = np.cross(_FACE_CENTERS, _E1)


def _res_basis(res: int):
    """(2, 2) lattice->plane matrix at ``res``: hex axial basis vectors
    scaled by 7^(-res/2) and rotated by res * _ROT (Class II/III alternation
    falls out of the cumulative rotation, as in aperture-7 grids)."""
    s = _RES0_SCALE / (_SQRT7 ** res)
    a = res * _ROT
    ca, sa = np.cos(a), np.sin(a)
    # axial hex basis: a1 = (1, 0), a2 = (1/2, sqrt(3)/2)
    b = np.array([[1.0, 0.5], [0.0, np.sqrt(3.0) / 2.0]]) * s
    rot = np.array([[ca, -sa], [sa, ca]])
    return rot @ b


def xyz_to_cell(xyz: np.ndarray, res: int) -> np.ndarray:
    """(N, 3) unit vectors -> uint64 hex cell ids at resolution ``res``."""
    if not (0 <= res <= MAX_RES):
        raise ValueError("resolution out of range")
    face = np.argmax(xyz @ _FACE_CENTERS.T, axis=1)
    c = _FACE_CENTERS[face]
    # gnomonic projection onto the tangent plane at the face center
    dot = np.einsum("nj,nj->n", xyz, c)
    px = np.einsum("nj,nj->n", xyz, _E1[face]) / dot
    py = np.einsum("nj,nj->n", xyz, _E2[face]) / dot
    B = _res_basis(res)
    Binv = np.linalg.inv(B)
    q = Binv[0, 0] * px + Binv[0, 1] * py
    r = Binv[1, 0] * px + Binv[1, 1] * py
    qi, ri = _hex_round(q, r)
    return _pack(res, face, qi, ri)


def _hex_round(q: np.ndarray, r: np.ndarray):
    """Cube-coordinate rounding to the nearest hex center (standard)."""
    s = -q - r
    rq = np.round(q)
    rr = np.round(r)
    rs = np.round(s)
    dq = np.abs(rq - q)
    dr = np.abs(rr - r)
    ds = np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    return rq.astype(np.int64), rr.astype(np.int64)


def _pack(res: int, face: np.ndarray, qi: np.ndarray, ri: np.ndarray) -> np.ndarray:
    return (
        (np.uint64(res) << np.uint64(59))
        | (face.astype(np.uint64) << np.uint64(54))
        | (((qi + _OFF).astype(np.uint64) & _MASK27) << np.uint64(27))
        | ((ri + _OFF).astype(np.uint64) & _MASK27)
    )


def cell_to_parts(ids: np.ndarray):
    ids = np.asarray(ids, dtype=np.uint64)
    res = (ids >> np.uint64(59)).astype(np.int64)
    face = ((ids >> np.uint64(54)) & np.uint64(31)).astype(np.int64)
    qi = ((ids >> np.uint64(27)) & _MASK27).astype(np.int64) - _OFF
    ri = (ids & _MASK27).astype(np.int64) - _OFF
    return res, face, qi, ri


def cell_center_xyz(ids: np.ndarray) -> np.ndarray:
    """Unit-vector centers of hex cells (lattice point projected back to the
    sphere). All ids must share one resolution for the vectorized path."""
    res, face, qi, ri = cell_to_parts(ids)
    r0 = int(res[0])
    if not (res == r0).all():
        raise ValueError("cell_center_xyz requires a single resolution")
    B = _res_basis(r0)
    px = B[0, 0] * qi + B[0, 1] * ri
    py = B[1, 0] * qi + B[1, 1] * ri
    c = _FACE_CENTERS[face]
    v = c + px[:, None] * _E1[face] + py[:, None] * _E2[face]
    return v / np.linalg.norm(v, axis=1, keepdims=True)


_DELTAS = np.array(
    [[1, 0], [0, 1], [-1, 1], [-1, 0], [0, -1], [1, -1]], dtype=np.int64
)


def neighbors(ids: np.ndarray, stitch: bool = False) -> np.ndarray:
    """(N, 6) hex 1-ring neighbors.

    ``stitch=False``: raw same-face lattice adjacency — neighbors of cells on
    an icosahedron-face boundary may be PHANTOM ids (lattice positions beyond
    the face edge that no point ever encodes to).

    ``stitch=True`` (cross-face stitching): each lattice-neighbor center
    direction is projected back to the sphere and re-encoded with
    ``xyz_to_cell``, so a neighbor beyond the face edge resolves to the REAL
    cell of the adjacent face that owns that direction. Every returned id is
    reachable by encoding (it contains its probe direction). A clipped
    boundary cell can map two lattice neighbors to the same stitched cell —
    callers needing set semantics dedupe per row (see ops-level users)."""
    res, face, qi, ri = cell_to_parts(ids)
    r0 = int(res[0]) if len(res) else 0
    if len(res) and not (res == r0).all():
        raise ValueError("neighbors requires a single resolution")
    if not stitch:
        out = np.empty((len(ids), 6), dtype=np.uint64)
        for k, (dq, dr) in enumerate(_DELTAS):
            out[:, k] = _pack(r0, face, qi + dq, ri + dr)
        return out
    B = _res_basis(r0)
    c = _FACE_CENTERS[face]
    e1 = _E1[face]
    e2 = _E2[face]
    out = np.empty((len(ids), 6), dtype=np.uint64)
    for k, (dq, dr) in enumerate(_DELTAS):
        nq = qi + dq
        nr = ri + dr
        px = B[0, 0] * nq + B[0, 1] * nr
        py = B[1, 0] * nq + B[1, 1] * nr
        v = c + px[:, None] * e1 + py[:, None] * e2
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        out[:, k] = xyz_to_cell(v, r0)
    return out

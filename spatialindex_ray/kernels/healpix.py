"""Vectorized HEALPix nested-scheme kernels.

From-scratch NumPy implementation of HEALPix nested indexing (Gorski et al.,
"HEALPix: a framework for high-resolution discretization ...", ApJ 622:759,
2005 — esp. Fig. 4). Bit-exact parity targets in the reference:

- point encoder sky2hpx:        /root/reference/src/sptIndx.c:561-729
- nested id assembly xyf2nest:  sptIndx.c:732-742 (+ utab, :532-548)
- pixel -> (z, phi) center:     /root/reference/lib/src/sptQueryLib.c:2207-2289
- bit de-interleave (ctab):     sptQueryLib.c:2324-2332 (+ ctab, :1281-1297)
- max pixel bounding radius:    sptQueryLib.c:2104-2201

The encoder is pure elementwise float64/int64 NumPy; `np.where` replaces the
equatorial/polar branch, which is safe because both branch expressions are
total functions of the inputs.
"""

from __future__ import annotations

import numpy as np

TWOTHIRD = 2.0 / 3.0
PI = 3.141592653589793238462643383279502884197
HALFPI = 1.570796326794896619231321691639751442099
DTR = 0.0174532925199432957692369076849

# utab[m]: spread the 8 bits of m so bit i lands at position 2i
# (sptIndx.c:528-531); ctab is the inverse gather (sptQueryLib.c:1277-1279).
_m = np.arange(256)
UTAB = (
    (_m & 0x1)
    | ((_m & 0x2) << 1)
    | ((_m & 0x4) << 2)
    | ((_m & 0x8) << 3)
    | ((_m & 0x10) << 4)
    | ((_m & 0x20) << 5)
    | ((_m & 0x40) << 6)
    | ((_m & 0x80) << 7)
).astype(np.int64)
CTAB = (
    (_m & 0x1)
    | ((_m & 0x2) << 7)
    | ((_m & 0x4) >> 1)
    | ((_m & 0x8) << 6)
    | ((_m & 0x10) >> 2)
    | ((_m & 0x20) << 5)
    | ((_m & 0x40) >> 3)
    | ((_m & 0x80) << 4)
).astype(np.int64)
del _m

JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4], dtype=np.int64)
JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7], dtype=np.int64)


def spread_bits(v):
    """Interleave-ready bit spread; mirrors spread_bits (sptIndx.c:738-742)."""
    v = np.asarray(v, dtype=np.int64)
    return (
        UTAB[v & 0xFF]
        | (UTAB[(v >> 8) & 0xFF] << 16)
        | (UTAB[(v >> 16) & 0xFF] << 32)
        | (UTAB[(v >> 24) & 0xFF] << 48)
    )


def compress_bits(v):
    """Inverse of spread_bits; mirrors hpxCompressBits (sptQueryLib.c:2324-2332)."""
    v = np.asarray(v, dtype=np.int64)
    raw = v & 0x5555555555555555
    raw = raw | (raw >> 15)
    return (
        CTAB[raw & 0xFF]
        | (CTAB[(raw >> 8) & 0xFF] << 4)
        | (CTAB[(raw >> 32) & 0xFF] << 16)
        | (CTAB[(raw >> 40) & 0xFF] << 20)
    )


def xyf2nest(order, ix, iy, face_num):
    """(face, ix, iy) -> nested pixel id (sptIndx.c:732-735)."""
    return (np.asarray(face_num, dtype=np.int64) << (2 * order)) + spread_bits(ix) + (
        spread_bits(iy) << 1
    )


def nest2xyf(order, pix):
    """nested pixel id -> (ix, iy, face)."""
    pix = np.asarray(pix, dtype=np.int64)
    npface = np.int64(1) << (2 * order)
    face = pix >> (2 * order)
    p = pix & (npface - 1)
    ix = compress_bits(p)
    iy = compress_bits(p >> 1)
    return ix, iy, face


def sky2hpx(order, lon_deg, lat_deg):
    """Vectorized HEALPix nested encoder; bit-exact port of sky2hpx
    (sptIndx.c:561-729). lon/lat in degrees -> (N,) int64 nested ids.
    """
    nside = np.int64(1) << order
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    dtr = PI / 180.0
    z = np.cos((90.0 - lat) * dtr)
    phi = lon * dtr
    zabs = np.abs(z)
    tt = phi / HALFPI

    # --- equatorial regime (zabs <= 2/3), sptIndx.c:610-669
    temp1 = nside * (0.5 + tt)
    temp2 = nside * (z * 0.75)
    jp_e = (temp1 - temp2).astype(np.int64)  # C cast truncation (values >= 0)
    jm_e = (temp1 + temp2).astype(np.int64)
    ifp = jp_e // nside
    ifm = jm_e // nside
    face_e = np.where(
        ifp == ifm, np.where(ifp == 4, 4, ifp + 4), np.where(ifp < ifm, ifp, ifm + 8)
    )
    ix_e = jm_e & (nside - 1)
    iy_e = (nside - 1) - (jp_e & (nside - 1))

    # --- polar regime (zabs > 2/3), sptIndx.c:678-715
    ntt = tt.astype(np.int64)  # truncation; tt >= 0
    ntt = np.minimum(ntt, 3)
    tp = tt - ntt
    tmp = nside * np.sqrt(3.0 * (1.0 - zabs))
    jp_p = (tp * tmp).astype(np.int64)  # C: (int)(tp*tmp), int32 in ref but
    jm_p = ((1.0 - tp) * tmp).astype(np.int64)  # values < nside fit either way
    jp_p = np.minimum(jp_p, nside - 1)
    jm_p = np.minimum(jm_p, nside - 1)
    north = z >= 0
    face_p = np.where(north, ntt, ntt + 8)
    ix_p = np.where(north, (nside - 1) - jm_p, jp_p)
    iy_p = np.where(north, (nside - 1) - jp_p, jm_p)

    eq = zabs <= TWOTHIRD
    face = np.where(eq, face_e, face_p)
    ix = np.where(eq, ix_e, ix_p)
    iy = np.where(eq, iy_e, iy_p)
    return xyf2nest(order, ix, iy, face)


def pix2loc(order, pix):
    """Vectorized nested pixel -> (z, phi) center; bit-exact port of
    hpxPix2Loc (sptQueryLib.c:2207-2289).
    """
    pix = np.asarray(pix, dtype=np.int64)
    nside = np.int64(1) << order
    npface = nside << order
    npix = 12 * npface
    fact2 = 4.0 / npix
    fact1 = float(nside << 1) * fact2

    ix, iy, face = nest2xyf(order, pix)
    jr = (JRLL[face] << order) - ix - iy - 1

    nr = np.where(jr < nside, jr, np.where(jr > 3 * nside, 4 * nside - jr, nside))
    z_n = 1.0 - (nr * nr) * fact2               # north polar cap
    z_s = (nr * nr) * fact2 - 1.0               # south polar cap
    z_e = (2 * nside - jr) * fact1              # equatorial belt
    z = np.where(jr < nside, z_n, np.where(jr > 3 * nside, z_s, z_e))

    itmp = JPLL[face] * nr + ix - iy
    itmp = np.where(itmp < 0, itmp + 8 * nr, itmp)
    phi = np.where(
        nr == nside, 0.75 * HALFPI * itmp * fact1, (0.5 * HALFPI * itmp) / nr
    )
    return z, phi


def pix2v3(order, pix):
    """Pixel centers as (N, 3) unit vectors, with the reference's
    sintheta = sqrt((1-z)*(1+z)) formulation (sptQueryLib.c:1436-1447)."""
    z, phi = pix2loc(order, pix)
    sintheta = np.sqrt((1.0 - z) * (1.0 + z))
    out = np.empty(np.shape(z) + (3,), dtype=np.float64)
    out[..., 0] = sintheta * np.cos(phi)
    out[..., 1] = sintheta * np.sin(phi)
    out[..., 2] = z
    return out


def max_pix_rad(order):
    """Max pixel center-to-corner distance (radians) at ``order``; bit-exact
    port of hpxMaxPixRad (sptQueryLib.c:2104-2201)."""
    nside = 1 << order
    z = 2.0 / 3.0
    sintheta = np.sqrt((1.0 - z) * (1.0 + z))
    phi = PI / (4.0 * nside)
    cx = sintheta * np.cos(phi)
    cy = sintheta * np.sin(phi)
    cz = z
    tmp = 1.0 - 1.0 / nside
    tmp = tmp * tmp
    z2 = 1.0 - tmp / 3.0
    sintheta2 = np.sqrt((1.0 - z2) * (1.0 + z2))
    qx = sintheta2  # cos(0) = 1, sin(0) = 0
    qy = 0.0
    qz = z2
    dot = cx * qx + cy * qy + cz * qz
    return float(np.arccos(dot))


# Face-neighbor tables for the nested scheme, from the public HEALPix
# reference implementation (healpix_base: nb_xoffset/nb_yoffset/nb_facearray/
# nb_swaparray). Used for vectorized 8-neighbor lookup — an engine addition
# (the reference library has no neighbor queries); needed for radius joins
# and kNN ring expansion.
_NB_XOFFSET = np.array([-1, -1, 0, 1, 1, 1, 0, -1], dtype=np.int64)
_NB_YOFFSET = np.array([0, 1, 1, 1, 0, -1, -1, -1], dtype=np.int64)
_NB_FACEARRAY = np.array(
    [
        [8, 9, 10, 11, -1, -1, -1, -1, 10, 11, 8, 9],    # S
        [5, 6, 7, 4, 8, 9, 10, 11, 9, 10, 11, 8],        # SE
        [-1, -1, -1, -1, 5, 6, 7, 4, -1, -1, -1, -1],    # E
        [4, 5, 6, 7, 11, 8, 9, 10, 11, 8, 9, 10],        # SW
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],          # center
        [1, 2, 3, 0, 0, 1, 2, 3, 5, 6, 7, 4],            # NE
        [-1, -1, -1, -1, 7, 4, 5, 6, -1, -1, -1, -1],    # W
        [3, 0, 1, 2, 3, 0, 1, 2, 4, 5, 6, 7],            # NW
        [2, 3, 0, 1, -1, -1, -1, -1, 0, 1, 2, 3],        # N
    ],
    dtype=np.int64,
)
_NB_SWAPARRAY = np.array(
    [
        [0, 0, 3],  # S
        [0, 0, 6],  # SE
        [0, 0, 0],  # E
        [0, 0, 5],  # SW
        [0, 0, 0],  # center
        [5, 0, 0],  # NE
        [0, 0, 0],  # W
        [6, 0, 0],  # NW
        [3, 0, 0],  # N
    ],
    dtype=np.int64,
)


def neighbors(order, pix):
    """Vectorized 8-neighbor lookup in the nested scheme.

    Returns an (N, 8) int64 array of neighboring pixel ids in SW, W, NW, N,
    NE, E, SE, S order; -1 where a neighbor does not exist (the 8 corner
    cases of the rhombic dodecahedron). Standard public HEALPix algorithm.
    """
    pix = np.atleast_1d(np.asarray(pix, dtype=np.int64))
    nside = np.int64(1) << order
    ix, iy, face = nest2xyf(order, pix)
    n = pix.shape[0]
    out = np.full((n, 8), -1, dtype=np.int64)

    nsm1 = nside - 1
    inner = (ix > 0) & (ix < nsm1) & (iy > 0) & (iy < nsm1)

    for m in range(8):
        x = ix + _NB_XOFFSET[m]
        y = iy + _NB_YOFFSET[m]
        # interior: same face
        simple = inner
        if simple.any():
            out[simple, m] = xyf2nest(order, x[simple], y[simple], face[simple])
        edge = ~inner
        if not edge.any():
            continue
        xe = x[edge]
        ye = y[edge]
        fe = face[edge]
        nbnum = np.full(xe.shape, 4, dtype=np.int64)
        nbnum = np.where(xe < 0, nbnum - 1, np.where(xe >= nside, nbnum + 1, nbnum))
        nbnum = np.where(ye < 0, nbnum - 3, np.where(ye >= nside, nbnum + 3, nbnum))
        xe = np.where(xe < 0, xe + nside, np.where(xe >= nside, xe - nside, xe))
        ye = np.where(ye < 0, ye + nside, np.where(ye >= nside, ye - nside, ye))
        f2 = _NB_FACEARRAY[nbnum, fe]
        bits = _NB_SWAPARRAY[nbnum, fe >> 2]
        ok = f2 >= 0
        xs = np.where(bits & 1, nside - xe - 1, xe)
        ys = np.where(bits & 2, nside - ye - 1, ye)
        xr = np.where(bits & 4, ys, xs)
        yr = np.where(bits & 4, xs, ys)
        res = np.where(ok, xyf2nest(order, xr, yr, np.maximum(f2, 0)), -1)
        out[edge, m] = res
    return out

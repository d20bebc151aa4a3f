"""Vectorized unit-sphere vector kernels.

Re-implements (from public formulas, bit-exactly) the scalar vector math of
the reference library — see /root/reference/lib/src/tinyhtm/include/tinyhtm/
geometry.h:90-232 (add/sub/dot/normalize/cross/rcross) and
lib/src/tinyhtm/src/geometry.c:136-262 (sc<->v3, angsep, edgedist2).

All NumPy ops here are elementwise float64 IEEE-754 with the same evaluation
order as the C code, so results are bit-identical (trig goes through the
platform libm in both cases).

Vectors are represented as (N, 3) float64 arrays (or (3,) for scalars).
"""

from __future__ import annotations

import numpy as np

RAD_PER_DEG = 0.0174532925199432957692369076849  # HTM_RAD_PER_DEG / DTR
DEG_PER_RAD = 57.2957795130823208767981548141    # HTM_DEG_PER_RAD


def sc_to_v3(lon_deg, lat_deg):
    """(lon, lat) degrees -> unit 3-vector; mirrors htm_sc_tov3 (geometry.c:136).

    Returns an (N, 3) float64 array. NOT normalized beyond the trig identity
    (the reference's htm_sc_tov3 does not normalize either; callers that need
    the sptIndx behaviour must call normalize() afterwards).
    """
    lon = np.asarray(lon_deg, dtype=np.float64) * RAD_PER_DEG
    lat = np.asarray(lat_deg, dtype=np.float64) * RAD_PER_DEG
    cos_lat = np.cos(lat)
    out = np.empty(lon.shape + (3,), dtype=np.float64)
    out[..., 0] = np.cos(lon) * cos_lat
    out[..., 1] = np.sin(lon) * cos_lat
    out[..., 2] = np.sin(lat)
    return out


def v3_to_sc(v):
    """Unit 3-vector -> (lon, lat) degrees; mirrors htm_v3_tosc (geometry.c:152)."""
    v = np.asarray(v, dtype=np.float64)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    d2 = x * x + y * y
    lon = np.where(d2 == 0.0, 0.0, np.arctan2(y, x) * DEG_PER_RAD)
    lon = np.where(lon < 0.0, lon + 360.0, lon)
    lon = np.where(lon == 360.0, 0.0, lon)
    lat = np.where(
        z == 0.0, 0.0, np.clip(np.arctan2(z, np.sqrt(d2)) * DEG_PER_RAD, -90.0, 90.0)
    )
    return lon, lat


def normalize(v):
    """v / ||v|| with ||v|| = sqrt((x*x + y*y) + z*z); htm_v3_normalize order."""
    v = np.asarray(v, dtype=np.float64)
    n = np.sqrt(v[..., 0] * v[..., 0] + v[..., 1] * v[..., 1] + v[..., 2] * v[..., 2])
    return v / n[..., None]


def dot(a, b):
    """a.x*b.x + a.y*b.y + a.z*b.z (left-assoc, like htm_v3_dot)."""
    a = np.asarray(a)
    b = np.asarray(b)
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def cross(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    out = np.empty(np.broadcast(a, b).shape, dtype=np.float64)
    out[..., 0] = a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1]
    out[..., 1] = a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2]
    out[..., 2] = a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
    return out


def rcross(v1, v2):
    """Twice the cross product of v1, v2 computed robustly for nearly identical
    unit vectors: cross(v2 + v1, v2 - v1). Mirrors htm_v3_rcross
    (geometry.h:203-216) — this exact formulation decides every HTM
    subdivision-plane sign test, so it must be reproduced verbatim.
    """
    v1 = np.asarray(v1)
    v2 = np.asarray(v2)
    x1 = v2[..., 0] + v1[..., 0]
    x2 = v2[..., 0] - v1[..., 0]
    y1 = v2[..., 1] + v1[..., 1]
    y2 = v2[..., 1] - v1[..., 1]
    z1 = v2[..., 2] + v1[..., 2]
    z2 = v2[..., 2] - v1[..., 2]
    out = np.empty(np.broadcast(v1, v2).shape, dtype=np.float64)
    out[..., 0] = y1 * z2 - z1 * y2
    out[..., 1] = z1 * x2 - x1 * z2
    out[..., 2] = x1 * y2 - y1 * x2
    return out


def midpoint(v1, v2):
    """normalize(v1 + v2) — _htm_vertex (htm.c:176-182)."""
    return normalize(np.asarray(v1, dtype=np.float64) + np.asarray(v2, dtype=np.float64))


def dist2(v1, v2):
    """Squared secant distance ||v1 - v2||^2 — htm_v3_dist2 (geometry.h:326)."""
    v1 = np.asarray(v1)
    v2 = np.asarray(v2)
    dx = v1[..., 0] - v2[..., 0]
    dy = v1[..., 1] - v2[..., 1]
    dz = v1[..., 2] - v2[..., 2]
    return dx * dx + dy * dy + dz * dz


def angsepu(v1, v2):
    """Angular separation in degrees between unit vectors (geometry.c:206-213)."""
    x = dist2(v1, v2) * 0.25
    angsep = 2.0 * DEG_PER_RAD * np.arcsin(np.sqrt(np.minimum(x, 1.0)))
    return np.minimum(angsep, 180.0)


def angsep(v1, v2):
    """Angular separation in degrees between arbitrary vectors (geometry.c:216-228)."""
    n = cross(v1, v2)
    ss = np.sqrt(dot(n, n))
    cs = dot(v1, v2)
    out = np.where((cs == 0.0) & (ss == 0.0), 0.0, np.arctan2(ss, cs) * DEG_PER_RAD)
    return np.minimum(out, 180.0)


def edgedist2_scalar(v, v1, v2, e):
    """Min square secant distance from point v to great-circle edge (v1, v2)
    with edge plane vector e (parallel to v1 x v2). Scalar port of
    htm_v3_edgedist2 (geometry.c:231-262); used by the cover planner.
    v, v1, v2, e are (3,) tuples/arrays of floats.
    """
    cx = v[1] * e[2] - v[2] * e[1]
    cy = v[2] * e[0] - v[0] * e[2]
    cz = v[0] * e[1] - v[1] * e[0]
    d_v1 = cx * v1[0] + cy * v1[1] + cz * v1[2]
    d_v2 = cx * v2[0] + cy * v2[1] + cz * v2[2]
    if d_v1 > 0.0 and d_v2 < 0.0:
        d = v[0] * e[0] + v[1] * e[1] + v[2] * e[2]
        x = d * d / (e[0] * e[0] + e[1] * e[1] + e[2] * e[2])
        if x > 1.0:
            return 2.0
        elif x < 1.0e-7:
            y = x * x
            return x + (0.25 * y + 0.125 * x * y)
        y = 1.0 - np.sqrt(1.0 - x)
        return (x - y * y) / (1 - y)
    else:
        dx1 = v[0] - v1[0]
        dy1 = v[1] - v1[1]
        dz1 = v[2] - v1[2]
        dx2 = v[0] - v2[0]
        dy2 = v[1] - v2[1]
        dz2 = v[2] - v2[2]
        d1 = dx1 * dx1 + dy1 * dy1 + dz1 * dz1
        d2_ = dx2 * dx2 + dy2 * dy2 + dz2 * dz2
        return d1 if d1 < d2_ else d2_

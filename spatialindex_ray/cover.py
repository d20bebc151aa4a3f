"""Region -> sorted cell-ID range decomposition (the query planner).

Faithful from-scratch ports of the reference's coverage algorithms. These run
once per query on the driver (tiny inputs, pure Python/NumPy); their outputs
— a sorted (R, 2) int64 range array — are broadcast into Ray Data tasks as
plan metadata.

Conformance targets:
- HTM circle cover:    /root/reference/lib/src/tinyhtm/src/htm.c:1147-1292
  (classifier htm.c:453-481, subdivision htm.c:161-275)
- HTM polygon cover:   htm.c:1417-1559 (classifier htm.c:689-810)
- HTM ellipse cover:   htm.c:1295-1414 (classifier htm.c:520-636)
- range auto-merge:    htm.c:424-447; coarsening htm.c:904-926
- HPX cone cover:      /root/reference/lib/src/sptQueryLib.c:1311-1630
- HPX polygon cover:   sptQueryLib.c:1633-2090
- 30% gap compression: sptQueryLib.c:134-237 (maxpct=30 at :48)
"""

from __future__ import annotations

import math

import numpy as np

from . import geom
from .geom import (
    _add,
    _cross,
    _dot,
    _midpoint,
    _neg,
    _norm,
    _normalize,
    _rcross,
    _dist2,
)
from .kernels import healpix, htm as htmk
from .kernels.vec import edgedist2_scalar

HTM_MAX_LEVEL = 24

# coverage codes (htm.c:81-86)
DISJOINT, INTERSECT, CONTAINS, INSIDE = 0, 1, 2, 3

_ROOT_VERTS = [
    [tuple(v) for v in htmk.ROOT_TRI_VERTS[r]] for r in range(8)
]
_ROOT_EDGES = [
    [tuple(v) for v in htmk.ROOT_TRI_EDGES[r]] for r in range(8)
]

_INF = float("inf")


class _Node:
    """One level of the DFS path (struct _htm_node, htm.c:90-100)."""

    __slots__ = ("vert", "edge", "mid_vert", "mid_edge", "id", "child")

    def __init__(self):
        self.vert = [None, None, None]
        self.edge = [None, None, None]
        self.mid_vert = [None, None, None]
        self.mid_edge = [None, None, None]
        self.id = 0
        self.child = 0


def _prep0(n):
    n.mid_vert[1] = _midpoint(n.vert[2], n.vert[0])
    n.mid_vert[2] = _midpoint(n.vert[0], n.vert[1])
    n.mid_edge[1] = _rcross(n.mid_vert[2], n.mid_vert[1])


def _make0(n, c):
    c.vert[0] = n.vert[0]
    c.vert[1] = n.mid_vert[2]
    c.vert[2] = n.mid_vert[1]
    c.edge[0] = n.edge[0]
    c.edge[1] = n.mid_edge[1]
    c.edge[2] = n.edge[2]
    n.child = 1
    c.id = n.id << 2
    c.child = 0


def _prep1(n):
    n.mid_vert[0] = _midpoint(n.vert[1], n.vert[2])
    n.mid_edge[2] = _rcross(n.mid_vert[0], n.mid_vert[2])


def _make1(n, c):
    c.vert[0] = n.vert[1]
    c.vert[1] = n.mid_vert[0]
    c.vert[2] = n.mid_vert[2]
    c.edge[0] = n.edge[1]
    c.edge[1] = n.mid_edge[2]
    c.edge[2] = n.edge[0]
    n.child = 2
    c.id = (n.id << 2) + 1
    c.child = 0


def _prep2(n):
    n.mid_edge[0] = _rcross(n.mid_vert[1], n.mid_vert[0])


def _make2(n, c):
    c.vert[0] = n.vert[2]
    c.vert[1] = n.mid_vert[1]
    c.vert[2] = n.mid_vert[0]
    c.edge[0] = n.edge[2]
    c.edge[1] = n.mid_edge[0]
    c.edge[2] = n.edge[1]
    n.child = 3
    c.id = (n.id << 2) + 2
    c.child = 0


def _make3(n, c):
    n.mid_edge[0] = _neg(n.mid_edge[0])
    n.mid_edge[1] = _neg(n.mid_edge[1])
    n.mid_edge[2] = _neg(n.mid_edge[2])
    c.vert[0] = n.mid_vert[0]
    c.vert[1] = n.mid_vert[1]
    c.vert[2] = n.mid_vert[2]
    c.edge[0] = n.mid_edge[0]
    c.edge[1] = n.mid_edge[1]
    c.edge[2] = n.mid_edge[2]
    n.child = 4
    c.id = (n.id << 2) + 3
    c.child = 0


def _ids_add(ranges, lo, hi):
    """_htm_ids_add (htm.c:424-447): append with adjacent-range auto-merge."""
    if ranges and lo == ranges[-1][1] + 1:
        ranges[-1][1] = hi
    else:
        ranges.append([lo, hi])


def _simplify_ids(ranges, n):
    """_htm_simplify_ids (htm.c:904-926): coarsen by n levels, re-merge."""
    if n <= 0 or not ranges:
        return ranges
    mask = (1 << (2 * n)) - 1
    out = []
    i = 0
    nr = len(ranges)
    while i < nr:
        lo = ranges[i][0] & ~mask
        hi = ranges[i][1] | mask
        while i < nr - 1:
            nxt = ranges[i + 1][0] & ~mask
            if nxt > hi + 1:
                break
            hi = ranges[i + 1][1] | mask
            i += 1
        out.append([lo, hi])
        i += 1
    ranges[:] = out
    return ranges


# ------------------------------------------------------------- classifiers
def _circle_htmcov(n, c, dist2):
    """_htm_s2circle_htmcov (htm.c:453-481)."""
    nin = (_dist2(c, n.vert[0]) <= dist2) + (_dist2(c, n.vert[1]) <= dist2) + (
        _dist2(c, n.vert[2]) <= dist2
    )
    if nin == 3:
        return INSIDE
    elif nin != 0:
        return INTERSECT
    if (
        edgedist2_scalar(c, n.vert[0], n.vert[1], n.edge[0]) <= dist2
        or edgedist2_scalar(c, n.vert[1], n.vert[2], n.edge[1]) <= dist2
        or edgedist2_scalar(c, n.vert[2], n.vert[0], n.edge[2]) <= dist2
    ):
        return INTERSECT
    if (
        _dot(c, n.edge[0]) >= 0.0
        and _dot(c, n.edge[1]) >= 0.0
        and _dot(c, n.edge[2]) >= 0.0
    ):
        return CONTAINS
    return DISJOINT


def _isect_test(v1, v2, nrm, poly):
    """_htm_isect_test (htm.c:689-775): does the polygon intersect great-circle
    edge (v1, v2) with plane normal nrm? Linear feasibility in 1 variable."""
    c0 = _cross(nrm, v1)
    c1 = _cross(v2, nrm)
    nv = poly.n
    edges = poly.edges
    ab = []
    if nrm[2] != 0.0:
        s = 1.0 if nrm[2] > 0.0 else -1.0
        ab.append((s * (c0[0] * nrm[2] - c0[2] * nrm[0]), s * (c0[1] * nrm[2] - c0[2] * nrm[1])))
        ab.append((s * (c1[0] * nrm[2] - c1[2] * nrm[0]), s * (c1[1] * nrm[2] - c1[2] * nrm[1])))
        for i in range(nv):
            e = edges[i]
            ab.append((s * (e[0] * nrm[2] - e[2] * nrm[0]), s * (e[1] * nrm[2] - e[2] * nrm[1])))
    elif nrm[1] != 0.0:
        s = 1.0 if nrm[1] > 0.0 else -1.0
        ab.append((s * (c0[0] * nrm[1] - c0[1] * nrm[0]), s * (c0[2] * nrm[1])))
        ab.append((s * (c1[0] * nrm[1] - c1[1] * nrm[0]), s * (c1[2] * nrm[1])))
        for i in range(nv):
            e = edges[i]
            ab.append((s * (e[0] * nrm[1] - e[1] * nrm[0]), s * (e[2] * nrm[1])))
    elif nrm[0] != 0.0:
        s = 1.0 if nrm[0] > 0.0 else -1.0
        ab.append((s * (c0[1] * nrm[0]), s * (c0[2] * nrm[0])))
        ab.append((s * (c1[1] * nrm[0]), s * (c1[2] * nrm[0])))
        for i in range(nv):
            e = edges[i]
            ab.append((s * (e[1] * nrm[0]), s * (e[2] * nrm[0])))
    else:
        return False
    min_1 = min_m1 = -_INF
    max_1 = max_m1 = _INF
    neg = pos = 0
    for a, b in ab:
        if a == 0.0:
            if b < 0.0:
                min_1, max_1 = _INF, -_INF
            elif b > 0.0:
                min_m1, max_m1 = _INF, -_INF
        elif a < 0.0:
            neg += 1
            d = -b / a
            if d < max_1:
                max_1 = d
            if -d < max_m1:
                max_m1 = -d
        else:
            pos += 1
            d = -b / a
            if d > min_1:
                min_1 = d
            if -d > min_m1:
                min_m1 = -d
    if min_1 <= max_1 or min_m1 <= max_m1:
        return True
    return neg == 0 or pos == 0


def _cpoly_htmcov(n, poly):
    """_htm_s2cpoly_htmcov (htm.c:780-810)."""
    nin = poly.contains(n.vert[0]) + poly.contains(n.vert[1]) + poly.contains(n.vert[2])
    if nin == 3:
        return INSIDE
    elif nin != 0:
        return INTERSECT
    if (
        _isect_test(n.vert[0], n.vert[1], n.edge[0], poly)
        or _isect_test(n.vert[1], n.vert[2], n.edge[1], poly)
        or _isect_test(n.vert[2], n.vert[0], n.edge[2], poly)
    ):
        return INTERSECT
    if (
        _dot(poly.vsum, n.edge[0]) >= 0.0
        and _dot(poly.vsum, n.edge[1]) >= 0.0
        and _dot(poly.vsum, n.edge[2]) >= 0.0
    ):
        return CONTAINS
    return DISJOINT


def _ellipse_isect(v1, v2, e):
    """_htm_s2ellipse_isect (htm.c:520-604)."""
    e1 = _add(v1, v2)
    e2 = (v2[0] - v1[0], v2[1] - v1[1], v2[2] - v1[2])
    c11 = (
        e1[0] * e1[0] * e.xx
        + e1[1] * e1[1] * e.yy
        + e1[2] * e1[2] * e.zz
        + e1[0] * e1[1] * e.xy * 2.0
        + e1[0] * e1[2] * e.xz * 2.0
        + e1[1] * e1[2] * e.yz * 2.0
    )
    c22 = (
        e2[0] * e2[0] * e.xx
        + e2[1] * e2[1] * e.yy
        + e2[2] * e2[2] * e.zz
        + e2[0] * e2[1] * e.xy * 2.0
        + e2[0] * e2[2] * e.xz * 2.0
        + e2[1] * e2[2] * e.yz * 2.0
    )
    c21 = (
        e2[0] * e1[0] * e.xx
        + e2[1] * e1[1] * e.yy
        + e2[2] * e1[2] * e.zz
        + (e2[0] * e1[1] + e2[1] * e1[0]) * e.xy
        + (e2[0] * e1[2] + e2[2] * e1[0]) * e.xz
        + (e2[1] * e1[2] + e2[2] * e1[1]) * e.yz
    )
    if c11 == 0.0:
        if e.a >= 90.0 or _dot(e1, e.cen) >= 0.0:
            return True
        if c22 == 0.0 or abs(c22) < abs(2.0 * c21):
            return False
        v = _add(geom._mul(e2, -2.0 * c21 / c22), e1)
        return _dot(v, e.cen) >= 0.0
    if c22 == 0.0:
        if c21 == 0.0:
            return False
        if abs(c11) <= abs(2.0 * c21):
            if e.a >= 90.0:
                return True
            v = _add(geom._mul(e2, -0.5 * c11 / c21), e1)
            return _dot(v, e.cen) >= 0.0
        return False
    delta = c21 * c21 - c11 * c22
    if delta < 0.0:
        return False
    delta = math.sqrt(delta)
    if abs(c22) >= abs(delta - c21):
        if e.a >= 90.0:
            return True
        v = _add(geom._mul(e2, (delta - c21) / c22), e1)
        return _dot(v, e.cen) >= 0.0
    if abs(c22) >= abs(delta + c21):
        if e.a >= 90.0:
            return True
        v = _add(geom._mul(e2, -(delta + c21) / c22), e1)
        return _dot(v, e.cen) >= 0.0
    return False


def _ellipse_htmcov(n, e):
    """_htm_s2ellipse_htmcov (htm.c:610-636)."""
    nin = e.contains(n.vert[0]) + e.contains(n.vert[1]) + e.contains(n.vert[2])
    if nin == 3:
        return INSIDE
    elif nin != 0:
        return INTERSECT
    if (
        _ellipse_isect(n.vert[0], n.vert[1], e)
        or _ellipse_isect(n.vert[1], n.vert[2], e)
        or _ellipse_isect(n.vert[2], n.vert[0], e)
    ):
        return INTERSECT
    if (
        _dot(e.cen, n.edge[0]) >= 0.0
        and _dot(e.cen, n.edge[1]) >= 0.0
        and _dot(e.cen, n.edge[2]) >= 0.0
    ):
        return CONTAINS
    return DISJOINT


# --------------------------------------------------------------- HTM covers
def _htm_cover(classify, level, maxranges):
    """Shared DFS skeleton of htm_s2{circle,ellipse,cpoly}_ids
    (htm.c:1147-1292 et al.): 8-root traversal, CONTAINS sibling pruning,
    emit with auto-merge, maxranges coarsening."""
    if level < 0 or level > HTM_MAX_LEVEL:
        raise ValueError("invalid HTM level")
    ranges: list = []
    efflevel = level
    path = [_Node() for _ in range(HTM_MAX_LEVEL + 1)]
    root = 0
    while root <= 7:
        node = path[0]
        node.vert = list(_ROOT_VERTS[root])
        node.edge = list(_ROOT_EDGES[root])
        node.id = root + 8
        node.child = 0
        curlevel = 0
        while True:
            cur = path[curlevel]
            cov = classify(cur)
            emit = False
            if cov == CONTAINS:
                if curlevel == 0:
                    root = 7  # no need to consider other roots
                else:
                    path[curlevel - 1].child = 4
                cov = INTERSECT
                emit = True  # fall-through chain
            if cov == INTERSECT:
                if curlevel < efflevel:
                    _prep0(cur)
                    _make0(cur, path[curlevel + 1])
                    curlevel += 1
                    continue
                emit = True
            if cov == INSIDE or emit:
                shift = (level - curlevel) * 2
                lo = cur.id << shift
                n_sub = 1 << shift
                _ids_add(ranges, lo, lo + n_sub - 1)
                while len(ranges) > maxranges and efflevel != 0:
                    efflevel -= 1
                    if curlevel > efflevel:
                        curlevel = efflevel
                    _simplify_ids(ranges, level - efflevel)
            # ascend towards the root
            curlevel -= 1
            while curlevel >= 0 and path[curlevel].child == 4:
                curlevel -= 1
            if curlevel < 0:
                break
            cur = path[curlevel]
            if cur.child == 1:
                _prep1(cur)
                _make1(cur, path[curlevel + 1])
            elif cur.child == 2:
                _prep2(cur)
                _make2(cur, path[curlevel + 1])
            else:
                _make3(cur, path[curlevel + 1])
            curlevel += 1
        root += 1
    return ranges


def htm_circle_ranges(center, radius_deg, level, maxranges=None):
    """htm_s2circle_ids (htm.c:1147-1292). center: unit 3-tuple, radius deg.

    With unbounded maxranges (the query path: sptQueryLib.c:103 passes
    SIZE_MAX) the decomposition runs on the vectorized level-synchronous
    frontier (byte-identical output, ~100x faster at deep levels); a finite
    maxranges falls back to the faithful scalar DFS because mid-traversal
    coarsening is traversal-order-dependent."""
    if radius_deg < 0.0:
        return []
    if radius_deg >= 180.0:
        lo = 8 << (level * 2)
        hi = (16 << (level * 2)) - 1
        return [[lo, hi]]
    s = math.sin(radius_deg * 0.5 * geom.RAD_PER_DEG)
    dist2 = 4.0 * s * s
    if maxranges is None:
        return _htm_cover_fast(_circle_classifier(center, dist2), level)
    return _htm_cover(lambda n: _circle_htmcov(n, center, dist2), level, maxranges)


def _edgedist2_vec(c, v1, v2, e):
    """Vectorized htm_v3_edgedist2 over (N,3) arrays (geometry.c:231-262),
    elementwise-identical to the scalar code."""
    cx = c[1] * e[:, 2] - c[2] * e[:, 1]
    cy = c[2] * e[:, 0] - c[0] * e[:, 2]
    cz = c[0] * e[:, 1] - c[1] * e[:, 0]
    d_v1 = cx * v1[:, 0] + cy * v1[:, 1] + cz * v1[:, 2]
    d_v2 = cx * v2[:, 0] + cy * v2[:, 1] + cz * v2[:, 2]
    interior = (d_v1 > 0.0) & (d_v2 < 0.0)
    d = c[0] * e[:, 0] + c[1] * e[:, 1] + c[2] * e[:, 2]
    x = d * d / (e[:, 0] * e[:, 0] + e[:, 1] * e[:, 1] + e[:, 2] * e[:, 2])
    y_small = x * x
    small = x + (0.25 * y_small + 0.125 * x * y_small)
    with np.errstate(invalid="ignore"):
        yb = 1.0 - np.sqrt(1.0 - np.minimum(x, 1.0))
        big = (x - yb * yb) / (1 - yb)
    interior_val = np.where(x > 1.0, 2.0, np.where(x < 1.0e-7, small, big))
    d1 = (c[0] - v1[:, 0]) ** 2 + (c[1] - v1[:, 1]) ** 2 + (c[2] - v1[:, 2]) ** 2
    d2_ = (c[0] - v2[:, 0]) ** 2 + (c[1] - v2[:, 1]) ** 2 + (c[2] - v2[:, 2]) ** 2
    endpoint_val = np.minimum(d1, d2_)
    return np.where(interior, interior_val, endpoint_val)


def _dot3(v, c):
    """Explicit x*c0 + y*c1 + z*c2 chain (no BLAS matvec) — must match the
    scalar htm_v3_dot rounding exactly."""
    return v[:, 0] * c[0] + v[:, 1] * c[1] + v[:, 2] * c[2]


def _circle_classifier(center, dist2):
    c = np.asarray(center, dtype=np.float64)

    def classify(v0, v1, v2, e0, e1, e2):
        din0 = ((c - v0) ** 2).sum(axis=1) <= dist2
        din1 = ((c - v1) ** 2).sum(axis=1) <= dist2
        din2 = ((c - v2) ** 2).sum(axis=1) <= dist2
        nin = din0.astype(np.int8) + din1 + din2
        inside = nin == 3
        intersect = (nin > 0) & ~inside
        check = nin == 0
        if check.any():
            ed = (
                (_edgedist2_vec(c, v0[check], v1[check], e0[check]) <= dist2)
                | (_edgedist2_vec(c, v1[check], v2[check], e1[check]) <= dist2)
                | (_edgedist2_vec(c, v2[check], v0[check], e2[check]) <= dist2)
            )
            contains = (
                (_dot3(e0[check], c) >= 0.0)
                & (_dot3(e1[check], c) >= 0.0)
                & (_dot3(e2[check], c) >= 0.0)
            )
            sub = np.zeros(check.sum(), dtype=np.int8)  # 0 = disjoint
            sub[ed] = 1           # intersect
            sub[~ed & contains] = 2  # contains -> treated as intersect/emit
            full = np.zeros(len(v0), dtype=np.int8)
            full[intersect] = 1
            full[inside] = 3
            full[check] = np.where(sub == 2, 1, sub)
        else:
            full = np.where(inside, np.int8(3), np.where(intersect, np.int8(1), np.int8(0)))
        return full  # 0 disjoint, 1 intersect(+contains), 3 inside

    return classify


def _isect_test_vec(va, vb, nrm, edges_np):
    """Vectorized _htm_isect_test (htm.c:689-775) over (N,3) triangle-edge
    arrays against a polygon's (nv,3) edge planes. The min/max feasibility
    accumulations are order-independent, so array evaluation matches the
    scalar loop exactly."""
    n = len(va)
    nv = len(edges_np)
    c0 = np.empty((n, 3)); c1 = np.empty((n, 3))
    # cross(nrm, va) and cross(vb, nrm), scalar _cross component order
    c0[:, 0] = nrm[:, 1] * va[:, 2] - nrm[:, 2] * va[:, 1]
    c0[:, 1] = nrm[:, 2] * va[:, 0] - nrm[:, 0] * va[:, 2]
    c0[:, 2] = nrm[:, 0] * va[:, 1] - nrm[:, 1] * va[:, 0]
    c1[:, 0] = vb[:, 1] * nrm[:, 2] - vb[:, 2] * nrm[:, 1]
    c1[:, 1] = vb[:, 2] * nrm[:, 0] - vb[:, 0] * nrm[:, 2]
    c1[:, 2] = vb[:, 0] * nrm[:, 1] - vb[:, 1] * nrm[:, 0]

    ab = np.empty((n, nv + 2, 2))

    def fill(branch_axis):
        # branch_axis: 2 -> n.z path, 1 -> n.y path, 0 -> n.x path
        s = np.where(nrm[:, branch_axis] > 0.0, 1.0, -1.0)
        w = nrm[:, branch_axis]
        out = np.empty((n, nv + 2, 2))
        if branch_axis == 2:
            out[:, 0, 0] = s * (c0[:, 0] * w - c0[:, 2] * nrm[:, 0])
            out[:, 0, 1] = s * (c0[:, 1] * w - c0[:, 2] * nrm[:, 1])
            out[:, 1, 0] = s * (c1[:, 0] * w - c1[:, 2] * nrm[:, 0])
            out[:, 1, 1] = s * (c1[:, 1] * w - c1[:, 2] * nrm[:, 1])
            for i in range(nv):
                e = edges_np[i]
                out[:, 2 + i, 0] = s * (e[0] * w - e[2] * nrm[:, 0])
                out[:, 2 + i, 1] = s * (e[1] * w - e[2] * nrm[:, 1])
        elif branch_axis == 1:
            out[:, 0, 0] = s * (c0[:, 0] * w - c0[:, 1] * nrm[:, 0])
            out[:, 0, 1] = s * (c0[:, 2] * w)
            out[:, 1, 0] = s * (c1[:, 0] * w - c1[:, 1] * nrm[:, 0])
            out[:, 1, 1] = s * (c1[:, 2] * w)
            for i in range(nv):
                e = edges_np[i]
                out[:, 2 + i, 0] = s * (e[0] * w - e[1] * nrm[:, 0])
                out[:, 2 + i, 1] = s * (e[2] * w)
        else:
            out[:, 0, 0] = s * (c0[:, 1] * w)
            out[:, 0, 1] = s * (c0[:, 2] * w)
            out[:, 1, 0] = s * (c1[:, 1] * w)
            out[:, 1, 1] = s * (c1[:, 2] * w)
            for i in range(nv):
                e = edges_np[i]
                out[:, 2 + i, 0] = s * (e[1] * w)
                out[:, 2 + i, 1] = s * (e[2] * w)
        return out

    use_z = nrm[:, 2] != 0.0
    use_y = ~use_z & (nrm[:, 1] != 0.0)
    use_x = ~use_z & ~use_y & (nrm[:, 0] != 0.0)
    none = ~use_z & ~use_y & ~use_x
    ab[use_z] = fill(2)[use_z]
    if use_y.any():
        ab[use_y] = fill(1)[use_y]
    if use_x.any():
        ab[use_x] = fill(0)[use_x]

    a = ab[:, :, 0]
    b = ab[:, :, 1]
    azero = a == 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        d = -b / a
    neg = (a < 0.0).sum(axis=1)
    pos = (a > 0.0).sum(axis=1)
    inf = np.inf
    max_1 = np.where(a < 0.0, d, inf).min(axis=1)
    min_1 = np.where(a > 0.0, d, -inf).max(axis=1)
    max_m1 = np.where(a < 0.0, -d, inf).min(axis=1)
    min_m1 = np.where(a > 0.0, -d, -inf).max(axis=1)
    kill_1 = (azero & (b < 0.0)).any(axis=1)
    kill_m1 = (azero & (b > 0.0)).any(axis=1)
    min_1 = np.where(kill_1, inf, min_1)
    max_1 = np.where(kill_1, -inf, max_1)
    min_m1 = np.where(kill_m1, inf, min_m1)
    max_m1 = np.where(kill_m1, -inf, max_m1)
    res = (min_1 <= max_1) | (min_m1 <= max_m1) | (neg == 0) | (pos == 0)
    res[none] = False
    return res


def _cpoly_classifier(poly: geom.ConvexPolygon):
    edges_np = [np.asarray(e, dtype=np.float64) for e in poly.edges]
    vsum = np.asarray(poly.vsum, dtype=np.float64)

    def pcontains(v):
        m = np.ones(len(v), dtype=bool)
        for e in edges_np:
            m &= _dot3(v, e) >= 0.0
        return m

    def classify(v0, v1, v2, e0, e1, e2):
        nin = pcontains(v0).astype(np.int8) + pcontains(v1) + pcontains(v2)
        inside = nin == 3
        intersect = (nin > 0) & ~inside
        check = nin == 0
        full = np.zeros(len(v0), dtype=np.int8)
        full[intersect] = 1
        full[inside] = 3
        if check.any():
            isect = (
                _isect_test_vec(v0[check], v1[check], e0[check], edges_np)
                | _isect_test_vec(v1[check], v2[check], e1[check], edges_np)
                | _isect_test_vec(v2[check], v0[check], e2[check], edges_np)
            )
            contains = (
                (_dot3(e0[check], vsum) >= 0.0)
                & (_dot3(e1[check], vsum) >= 0.0)
                & (_dot3(e2[check], vsum) >= 0.0)
            )
            sub = np.zeros(int(check.sum()), dtype=np.int8)
            sub[isect] = 1
            sub[~isect & contains] = 1  # CONTAINS behaves as intersect
            full[check] = sub
        return full

    return classify


def _ellipse_isect_vec(va, vb, e: geom.Ellipse):
    """Vectorized _htm_s2ellipse_isect (htm.c:520-604) over (N,3) edges."""
    e1 = va + vb
    e2 = vb - va
    xx, yy, zz, xy, xz, yz = e.xx, e.yy, e.zz, e.xy, e.xz, e.yz
    c11 = (
        e1[:, 0] * e1[:, 0] * xx
        + e1[:, 1] * e1[:, 1] * yy
        + e1[:, 2] * e1[:, 2] * zz
        + e1[:, 0] * e1[:, 1] * xy * 2.0
        + e1[:, 0] * e1[:, 2] * xz * 2.0
        + e1[:, 1] * e1[:, 2] * yz * 2.0
    )
    c22 = (
        e2[:, 0] * e2[:, 0] * xx
        + e2[:, 1] * e2[:, 1] * yy
        + e2[:, 2] * e2[:, 2] * zz
        + e2[:, 0] * e2[:, 1] * xy * 2.0
        + e2[:, 0] * e2[:, 2] * xz * 2.0
        + e2[:, 1] * e2[:, 2] * yz * 2.0
    )
    c21 = (
        e2[:, 0] * e1[:, 0] * xx
        + e2[:, 1] * e1[:, 1] * yy
        + e2[:, 2] * e1[:, 2] * zz
        + (e2[:, 0] * e1[:, 1] + e2[:, 1] * e1[:, 0]) * xy
        + (e2[:, 0] * e1[:, 2] + e2[:, 2] * e1[:, 0]) * xz
        + (e2[:, 1] * e1[:, 2] + e2[:, 2] * e1[:, 1]) * yz
    )
    cen = np.asarray(e.cen, dtype=np.float64)
    big_a = e.a >= 90.0

    def hemi(k):
        # v = e2 * k + e1 (componentwise, scalar op order), then dot with cen
        vx = e2[:, 0] * k + e1[:, 0]
        vy = e2[:, 1] * k + e1[:, 1]
        vz = e2[:, 2] * k + e1[:, 2]
        return vx * cen[0] + vy * cen[1] + vz * cen[2] >= 0.0

    d_e1 = _dot3(e1, cen)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        # case A: c11 == 0
        resA = np.where(
            big_a | (d_e1 >= 0.0),
            True,
            np.where(
                (c22 == 0.0) | (np.abs(c22) < np.abs(2.0 * c21)),
                False,
                hemi(-2.0 * c21 / c22),
            ),
        )
        # case B: c11 != 0, c22 == 0
        resB = np.where(
            c21 == 0.0,
            False,
            np.where(
                np.abs(c11) <= np.abs(2.0 * c21),
                big_a | hemi(-0.5 * c11 / c21),
                False,
            ),
        )
        delta = c21 * c21 - c11 * c22
        sq = np.sqrt(np.maximum(delta, 0.0))
        resD = big_a | hemi((sq - c21) / c22)
        resE = big_a | hemi(-(sq + c21) / c22)
        resC = np.where(
            delta < 0.0,
            False,
            np.where(
                np.abs(c22) >= np.abs(sq - c21),
                resD,
                np.where(np.abs(c22) >= np.abs(sq + c21), resE, False),
            ),
        )
    return np.where(c11 == 0.0, resA, np.where(c22 == 0.0, resB, resC)).astype(bool)


def _ellipse_classifier(e: geom.Ellipse):
    cen = np.asarray(e.cen, dtype=np.float64)

    def classify(v0, v1, v2, e0, e1, e2):
        nin = e.mask(v0).astype(np.int8) + e.mask(v1) + e.mask(v2)
        inside = nin == 3
        intersect = (nin > 0) & ~inside
        check = nin == 0
        full = np.zeros(len(v0), dtype=np.int8)
        full[intersect] = 1
        full[inside] = 3
        if check.any():
            isect = (
                _ellipse_isect_vec(v0[check], v1[check], e)
                | _ellipse_isect_vec(v1[check], v2[check], e)
                | _ellipse_isect_vec(v2[check], v0[check], e)
            )
            contains = (
                (_dot3(e0[check], cen) >= 0.0)
                & (_dot3(e1[check], cen) >= 0.0)
                & (_dot3(e2[check], cen) >= 0.0)
            )
            sub = np.zeros(int(check.sum()), dtype=np.int8)
            sub[isect | (~isect & contains)] = 1
            full[check] = sub
        return full

    return classify


def _htm_cover_fast(classify, level):
    """Level-synchronous NumPy frontier version of the HTM cover DFS.

    Equivalence to the scalar traversal: (1) the CONTAINS sibling-pruning in
    the C code is a pure optimization — a triangle strictly containing the
    region forces every disjoint triangle to classify DISJOINT anyway; (2)
    left-to-right DFS emissions are globally sorted by range min, so
    emitting per level, sorting by min and replaying the append-merge rule
    (_htm_ids_add) yields the identical range list. Verified byte-exact
    against the scalar path in tests."""
    from .kernels import vec as kvec

    v0 = htmk.ROOT_TRI_VERTS[:, 0, :].copy()
    v1 = htmk.ROOT_TRI_VERTS[:, 1, :].copy()
    v2 = htmk.ROOT_TRI_VERTS[:, 2, :].copy()
    e0 = htmk.ROOT_TRI_EDGES[:, 0, :].copy()
    e1 = htmk.ROOT_TRI_EDGES[:, 1, :].copy()
    e2 = htmk.ROOT_TRI_EDGES[:, 2, :].copy()
    ids = np.arange(8, 16, dtype=np.int64)

    emissions = []  # (min, max) arrays per level

    for curlevel in range(level + 1):
        cov = classify(v0, v1, v2, e0, e1, e2)
        shift = (level - curlevel) * 2
        emit = (cov == 3) | ((cov == 1) & (curlevel == level))
        if emit.any():
            lo = ids[emit] << shift
            emissions.append((lo, lo + (np.int64(1) << shift) - 1))
        descend = (cov == 1) & (curlevel < level)
        if not descend.any():
            break
        v0d, v1d, v2d = v0[descend], v1[descend], v2[descend]
        e0d, e1d, e2d = e0[descend], e1[descend], e2[descend]
        idd = ids[descend]
        sv1 = kvec.midpoint(v2d, v0d)
        sv2 = kvec.midpoint(v0d, v1d)
        sv0 = kvec.midpoint(v1d, v2d)
        em1 = kvec.rcross(sv2, sv1)
        em2 = kvec.rcross(sv0, sv2)
        em0 = kvec.rcross(sv1, sv0)
        # children in id order 0..3 interleaved so ids stay globally sorted
        n = len(idd)
        v0 = np.empty((4 * n, 3)); v1 = np.empty((4 * n, 3)); v2 = np.empty((4 * n, 3))
        e0 = np.empty((4 * n, 3)); e1 = np.empty((4 * n, 3)); e2 = np.empty((4 * n, 3))
        ids = np.empty(4 * n, dtype=np.int64)
        # child 0: (v0, sv2, sv1) edges (e0, em1, e2)
        v0[0::4], v1[0::4], v2[0::4] = v0d, sv2, sv1
        e0[0::4], e1[0::4], e2[0::4] = e0d, em1, e2d
        ids[0::4] = idd << 2
        # child 1: (v1, sv0, sv2) edges (e1, em2, e0)
        v0[1::4], v1[1::4], v2[1::4] = v1d, sv0, sv2
        e0[1::4], e1[1::4], e2[1::4] = e1d, em2, e0d
        ids[1::4] = (idd << 2) + 1
        # child 2: (v2, sv1, sv0) edges (e2, em0, e1)
        v0[2::4], v1[2::4], v2[2::4] = v2d, sv1, sv0
        e0[2::4], e1[2::4], e2[2::4] = e2d, em0, e1d
        ids[2::4] = (idd << 2) + 2
        # child 3: (sv0, sv1, sv2) edges (-em0, -em1, -em2)
        v0[3::4], v1[3::4], v2[3::4] = sv0, sv1, sv2
        e0[3::4], e1[3::4], e2[3::4] = -em0, -em1, -em2
        ids[3::4] = (idd << 2) + 3

    if not emissions:
        return []
    mins = np.concatenate([e[0] for e in emissions])
    maxs = np.concatenate([e[1] for e in emissions])
    order = np.argsort(mins, kind="stable")
    ranges: list = []
    for lo, hi in zip(mins[order].tolist(), maxs[order].tolist()):
        _ids_add(ranges, lo, hi)
    return ranges


def htm_polygon_ranges(poly: geom.ConvexPolygon, level, maxranges=None):
    """htm_s2cpoly_ids (htm.c:1417-1559). Unbounded maxranges (the query
    path) runs on the vectorized frontier; finite maxranges keeps the
    faithful scalar DFS (see htm_circle_ranges)."""
    if maxranges is None:
        return _htm_cover_fast(_cpoly_classifier(poly), level)
    return _htm_cover(lambda n: _cpoly_htmcov(n, poly), level, maxranges)


def htm_ellipse_ranges(ellipse: geom.Ellipse, level, maxranges=None):
    """htm_s2ellipse_ids (htm.c:1295-1414). Unbounded maxranges runs on the
    vectorized frontier; finite keeps the scalar DFS."""
    if maxranges is None:
        return _htm_cover_fast(_ellipse_classifier(ellipse), level)
    return _htm_cover(lambda n: _ellipse_htmcov(n, ellipse), level, maxranges)


# --------------------------------------------------------------- HPX covers
_CTAB_PY = [int(v) for v in healpix.CTAB]
_JRLL_PY = [int(v) for v in healpix.JRLL]
_JPLL_PY = [int(v) for v in healpix.JPLL]


def _compress_bits_scalar(v: int) -> int:
    raw = v & 0x5555555555555555
    raw |= raw >> 15
    return (
        _CTAB_PY[raw & 0xFF]
        | (_CTAB_PY[(raw >> 8) & 0xFF] << 4)
        | (_CTAB_PY[(raw >> 32) & 0xFF] << 16)
        | (_CTAB_PY[(raw >> 40) & 0xFF] << 20)
    )


def _hpx_pix2loc_scalar(order, pix):
    """Scalar hpxPix2Loc (sptQueryLib.c:2207-2289)."""
    nside = 1 << order
    npface = nside << order
    npix = 12 * npface
    fact2 = 4.0 / npix
    fact1 = (nside << 1) * fact2
    face = pix >> (2 * order)
    p = pix & (npface - 1)
    ix = _compress_bits_scalar(p)
    iy = _compress_bits_scalar(p >> 1)
    jr = (_JRLL_PY[face] << order) - ix - iy - 1
    if jr < nside:
        nr = jr
        z = 1 - (nr * nr) * fact2
    elif jr > 3 * nside:
        nr = 4 * nside - jr
        z = (nr * nr) * fact2 - 1
    else:
        nr = nside
        z = (2 * nside - jr) * fact1
    itmp = _JPLL_PY[face] * nr + ix - iy
    if itmp < 0:
        itmp += 8 * nr
    if nr == nside:
        phi = 0.75 * healpix.HALFPI * itmp * fact1
    else:
        phi = (0.5 * healpix.HALFPI * itmp) / nr
    return z, phi


def _emit_hpx(rng, lo, hi):
    """HPX range emission with the reference's previous-range merge check
    (sptQueryLib.c:1519-1522)."""
    if rng and lo == rng[-1][1] + 1:
        rng[-1][1] = hi
    else:
        rng.append([lo, hi])


def _g(v: float) -> str:
    """C printf %g (6 significant digits, trailing zeros dropped) — the
    format every reference debug dump uses for floats."""
    return "%g" % v


_ZONE_TEXT = {
    1: "DEBUG> zone 1: pixel may overlap with the shape, pixel center is outside\n",
    2: "DEBUG> zone 2: pixel center is inside the shape, but maybe not the complete pixel\n",
    3: "DEBUG> zone 3: pixel lies completely inside the shape\n",
}


def _acos_c(v: float) -> float:
    """libm acos: out-of-domain input yields NaN (printf renders 'nan')
    rather than raising — dot products of unit vectors can exceed 1 by an
    ulp and the reference's debug dumps print whatever acos returns."""
    return math.acos(v) if -1.0 <= v <= 1.0 else float("nan")


def hpx_cone_ranges(omax, ra, dec, radius_deg, trace=None):
    """hpxConeSearch (sptQueryLib.c:1311-1630): explicit-stack descent from
    the 12 base pixels with bounding-circle zone classification.

    NOTE the reference quirk kept verbatim: a fully-inside pixel at order o
    emits [pix << 2d, (pix+1) << 2d] — the max is one past the true subpixel
    range (sptQueryLib.c:1507-1508).

    ``trace``: optional list; when given, every ``sptDebug`` diagnostic the
    reference prints along this walk (sptQueryLib.c:1367-1624) is appended
    byte-identically (the CLI ``-d`` surface). Zero overhead when None.
    """
    DTR = geom.RAD_PER_DEG
    ux = math.cos(ra * DTR) * math.cos(dec * DTR)
    uy = math.sin(ra * DTR) * math.cos(dec * DTR)
    uz = math.sin(dec * DTR)
    radius = radius_deg * DTR
    cosrad = math.cos(radius)

    dr = [0.0] * (omax + 1)
    crpdr = [0.0] * (omax + 1)
    crmdr = [0.0] * (omax + 1)
    for o in range(omax + 1):
        dr[o] = healpix.max_pix_rad(o)
        if trace is not None:
            trace.append(
                "DEBUG> order %2d:  nside = %d, pixel size = %8.4f deg, "
                "R-dr = %8.4f, R+dr = %8.4f\n"
                % (o, 1 << o, dr[o] / DTR, (radius - dr[o]) / DTR, (radius + dr[o]) / DTR)
            )
        crpdr[o] = math.cos(radius + dr[o])
        crmdr[o] = math.cos(radius - dr[o])
        if radius + dr[o] > healpix.PI:
            crpdr[o] = -1.0
        if radius - dr[o] < 0.0:
            crmdr[o] = 1.0

    rng: list = []
    stack = []
    if trace is not None:
        trace.append("\nInitialize stack\n")
    for i in range(12):
        if trace is not None:
            trace.append(
                "DEBUG> push stack[%2d]: pix = %d, order = %d\n" % (len(stack), 11 - i, 0)
            )
        stack.append((11 - i, 0))
    while stack:
        if trace is not None:
            pk, ok = stack[-1]
            trace.append(
                "--------\nDEBUG>  POP stack[%2d]: pix = %d, order = %d\n"
                % (len(stack) - 1, pk, ok)
            )
        pix, o = stack.pop()
        z, phi = _hpx_pix2loc_scalar(o, pix)
        sintheta = math.sqrt((1.0 - z) * (1.0 + z))
        px = sintheta * math.cos(phi)
        py = sintheta * math.sin(phi)
        pz = z
        if trace is not None:
            trace.append(
                "DEBUG> pixel %d / order %d:  z,phi = (%s, %s), ra,dec = (%s,%s)\n"
                % (pix, o, _g(z), _g(phi), _g(phi / DTR), _g(90.0 - math.acos(z) / DTR))
            )
        cangdist = ux * px + uy * py + uz * pz
        if trace is not None:
            trace.append("DEBUG> pixel %d / order %d:\n" % (pix, o))
            trace.append(
                "DEBUG>       cangdist = %9.6f (distance = %8.4f)\n"
                % (cangdist, _acos_c(cangdist) / DTR)
            )
            trace.append(
                "DEBUG>       cosrad   = %9.6f (R        = %8.4f)\n"
                % (cosrad, math.acos(cosrad) / DTR)
            )
            trace.append(
                "DEBUG>                            (dr       = %8.4f)\n" % (dr[o] / DTR)
            )
            trace.append(
                "DEBUG>       crmdr    = %9.6f (R-dr     = %8.4f)\n"
                % (crmdr[o], math.acos(crmdr[o]) / DTR)
            )
            trace.append(
                "DEBUG>       crpdr    = %9.6f (R+dr     = %8.4f)\n"
                % (crpdr[o], math.acos(crpdr[o]) / DTR)
            )
        if cangdist > crpdr[o]:
            if cangdist < cosrad:
                zone = 1
            elif cangdist <= crmdr[o]:
                zone = 2
            else:
                zone = 3
            if trace is not None:
                trace.append(_ZONE_TEXT[zone])
            if o < omax:
                if zone == 3:
                    sdist = 2 * (omax - o)
                    if trace is not None:
                        trace.append(
                            "DEBUG> RANGE %d (save pixels: %d to %d)\n"
                            % (len(rng), pix << sdist, (pix + 1) << sdist)
                        )
                    _emit_hpx(rng, pix << sdist, (pix + 1) << sdist)
                else:
                    for i in range(4):
                        if trace is not None:
                            trace.append(
                                "DEBUG> push stack[%2d]: pix = %d, order = %d\n"
                                % (len(stack), 4 * pix + 3 - i, o + 1)
                            )
                        stack.append((4 * pix + 3 - i, o + 1))
            else:
                if trace is not None:
                    trace.append("DEBUG> RANGE %d (save pixel: %d)\n" % (len(rng), pix))
                _emit_hpx(rng, pix, pix)
    if trace is not None:
        # tail summary + full per-pixel dump (sptQueryLib.c:1588-1624)
        trace.append("\nCenter: (%8.4f,%8.4f)  Radius: %s\n\n" % (ra, dec, _g(radius / DTR)))
        for i, (mn, mx) in enumerate(rng):
            trace.append("RANGE> %d: %d - %d\n" % (i, mn, mx))
            for pix in range(mn, mx + 1):
                z, phi = _hpx_pix2loc_scalar(omax, pix)
                sintheta = math.sqrt((1.0 - z) * (1.0 + z))
                dot = (
                    ux * sintheta * math.cos(phi)
                    + uy * sintheta * math.sin(phi)
                    + uz * z
                )
                dist = _acos_c(dot)
                trace.append(
                    "       %d: z,phi (%8.5f %8.5f) -> ra,dec (%8.4f, %8.4f) "
                    "[pixel size: %s, distance: %s]\n"
                    % (pix, z, phi, phi / DTR, 90.0 - math.acos(z) / DTR,
                       _g(dr[omax] / DTR), _g(dist / DTR))
                )
    return rng


def hpx_polygon_ranges(omax, ra, dec, compat=True, trace=None):
    """hpxPolygonSearch (sptQueryLib.c:1633-2090): per-edge three-band test
    with bounding-circle prune and zone demotion.

    compat=True reproduces the reference bit-for-bit INCLUDING its broken
    min-enclosing-circle recursion (hpxGetCircle, sptQueryLib.c:2309-2320,
    never re-includes the point that triggered the recursion), which silently
    prunes interior cells of polygons whose first edge does not span the
    polygon — e.g. a 12x10 deg quad loses ~30% of its interior cells. Use
    compat=False (conservative vertex-hull bounding circle) for engine query
    plans that must be correct supersets.

    Raises geom.RegionError for degenerate / non-convex polygons (the C code
    returns 1 range in that case, treated upstream as an error path).

    ``trace``: optional list; when given, the ``sptDebug`` diagnostics of
    hpxPolygonSearch (sptQueryLib.c:1676-2086) are appended byte-identically
    — including its re-derivation of the normals (the reference prints them
    a second time inside this function). Zero overhead when None."""
    npoly = len(ra)
    collect = None if trace is None else []
    if trace is not None:
        trace.append("\nIn hpxPolygonSearch()\n")
    poly, normal = geom.polygon_normals(ra, dec, collect=collect)
    if trace is not None:
        nreverse = 0
        for i, (pre, handed, rev) in enumerate(collect):
            trace.append(
                "Normal (x,y,z)  = (%11.8f,%11.8f,%11.8f) [handedness: %11.8f]\n"
                % (pre[0], pre[1], pre[2], handed)
            )
            if rev:
                # NOTE: no "DEBUG> " prefix here, unlike sptPolygonSearch's
                # own loop (sptQueryLib.c:1703 vs :690)
                trace.append("Reversing normal %d\n" % i)
                nreverse += 1
        if nreverse > 0:
            trace.append("\n%d reversed\n\n" % nreverse)

    if compat:
        center, cosrad = _hpx_bounding_circle(poly)
    else:
        unit = [_normalize(p) for p in poly]
        csum = (
            sum(p[0] for p in unit),
            sum(p[1] for p in unit),
            sum(p[2] for p in unit),
        )
        center = _normalize(csum)
        cosrad = min(_dot(p, center) for p in unit)
    rcenter = math.acos(cosrad)
    if trace is not None:
        DTR = geom.RAD_PER_DEG
        trace.append(
            "Bounding circle: (%s, %s) [%s]\n"
            % (
                _g(math.atan2(center[1], center[0]) / DTR),
                _g(math.asin(center[2]) / DTR),
                _g(math.acos(cosrad) / DTR),
            )
        )

    dr = [0.0] * (omax + 1)
    crlimit = [[[0.0] * 3 for _ in range(npoly)] for _ in range(omax + 1)]
    for o in range(omax + 1):
        dr[o] = healpix.max_pix_rad(o)
        for i in range(npoly):
            crlimit[o][i][0] = (
                -1.0 if healpix.HALFPI + dr[o] > healpix.PI else math.cos(healpix.HALFPI + dr[o])
            )
            # quirk kept verbatim (sptQueryLib.c:1778): band 1 is 0 at order 0
            # and copies crlimit[0][i][1] (i.e. stays 0) at deeper orders.
            crlimit[o][i][1] = 0.0 if o == 0 else crlimit[0][i][1]
            crlimit[o][i][2] = (
                1.0 if healpix.HALFPI - dr[o] < 0.0 else math.cos(healpix.HALFPI - dr[o])
            )

    rng: list = []
    stack = []
    if trace is not None:
        DTR = geom.RAD_PER_DEG
        trace.append("\nInitialize stack\n")
    for i in range(12):
        if trace is not None:
            trace.append(
                "DEBUG> push stack[%2d]: pix = %d, order = %d\n" % (len(stack), 11 - i, 0)
            )
        stack.append((11 - i, 0))
    while stack:
        if trace is not None:
            pk, ok = stack[-1]
            trace.append(
                "--------\nDEBUG>  POP stack[%2d]: pix = %d, order = %d\n"
                % (len(stack) - 1, pk, ok)
            )
            if len(stack) == 1:
                trace.append("DEBUG>  This is the end of the stack; we exit after this\n")
        pix, o = stack.pop()
        z, phi = _hpx_pix2loc_scalar(o, pix)
        sintheta = math.sqrt((1.0 - z) * (1.0 + z))
        px = sintheta * math.cos(phi)
        py = sintheta * math.sin(phi)
        pz = z
        if trace is not None:
            trace.append(
                "DEBUG> pixel %d / order %d:  z,phi = (%s, %s), ra,dec = (%s,%s)\n"
                % (pix, o, _g(z), _g(phi), _g(phi / DTR), _g(90.0 - math.acos(z) / DTR))
            )
        zone = 3
        for i in range(npoly):
            crad = px * normal[i][0] + py * normal[i][1] + pz * normal[i][2]
            rdist = math.acos(px * center[0] + py * center[1] + pz * center[2])
            if rdist > rcenter + dr[o]:
                zone = 0
            # C evaluates `izone < zone` against the *mutated* zone each
            # iteration (sptQueryLib.c:1924-1955) — keep that semantics.
            izone = 0
            while izone < zone:
                if crad < crlimit[o][i][izone]:
                    zone = izone
                    if zone == 0:
                        break
                izone += 1
            if zone == 0:
                break
        if zone > 0:
            if trace is not None:
                trace.append(_ZONE_TEXT[zone])
            if o < omax:
                if zone == 3:
                    sdist = 2 * (omax - o)
                    if trace is not None:
                        trace.append(
                            "DEBUG> RANGE %d (save pixels: %d to %d)\n"
                            % (len(rng), pix << sdist, (pix + 1) << sdist)
                        )
                    _emit_hpx(rng, pix << sdist, (pix + 1) << sdist)
                else:
                    for i in range(4):
                        if trace is not None:
                            trace.append(
                                "DEBUG> push stack[%2d]: pix = %d, order = %d\n"
                                % (len(stack), 4 * pix + 3 - i, o + 1)
                            )
                        stack.append((4 * pix + 3 - i, o + 1))
            else:
                if trace is not None:
                    trace.append("DEBUG> RANGE %d (save pixel: %d)\n" % (len(rng), pix))
                _emit_hpx(rng, pix, pix)
    if trace is not None:
        trace.append("\nDEBUG>  Done with stack, returning %d ranges.\n\n" % len(rng))
    return rng


def _hpx_bounding_circle(points):
    """hpxBoundingCircle / hpxGetCircle (sptQueryLib.c:2295-2320): recursive
    approximate min enclosing circle. Returns (center tuple, cos(radius))."""

    def vmid(a, b):
        c = _add(a, b)
        n = _norm(c)
        if n == 0.0:
            n = 1.0
        return (c[0] / n, c[1] / n, c[2] / n)

    def get_circle(q):
        center = vmid(points[0], points[1])
        cosrad = _dot(points[0], center)
        for i in range(1, q):
            if _dot(points[i], center) < cosrad:
                center, cosrad = get_circle(i)
        return center, cosrad

    center = vmid(points[0], points[1])
    cosrad = _dot(points[0], center)
    for i in range(2, len(points)):
        if _dot(points[i], center) < cosrad:
            center, cosrad = get_circle(i)
    return center, cosrad


# ------------------------------------------------------- 30% gap compression
def gap_compress(ranges, maxpct=30.0, trace=None):
    """The reference's plan-size compression (sptQueryLib.c:134-237): sort
    inter-range gaps ascending (stable on ties) and greedily merge ranges
    into their predecessor while the cumulative gap percentage (relative to
    the total covered cells) stays below ``maxpct``.

    ranges: list of [min, max]; returns a new list of [min, max].

    ``trace``: optional list; when given, the "Reassign index" debug lines
    (sptQueryLib.c:205-209) are appended in skip-sorted order, byte-identical
    to the reference's ``-d`` output (glibc qsort is effectively stable —
    mergesort — so the stable tie order here matches).
    """
    nranges = len(ranges)
    if nranges == 0:
        return []
    counts = [0] * nranges
    total = 0.0
    for i in range(nranges):
        if i > 0:
            counts[i] = ranges[i][0] - ranges[i - 1][1]
        total += ranges[i][1] - ranges[i][0] + 1.0
    order = sorted(range(nranges), key=lambda i: counts[i])  # stable on ties
    remove = [False] * nranges
    sumpct = 0.0
    for i in order:
        pct = 100.0 * counts[i] / total
        sumpct += pct
        if sumpct < maxpct and i > 0:
            if trace is not None:
                trace.append("Reassign index %d (%d cells)\n" % (i, counts[i]))
            remove[i] = True
    out = []
    for i in range(nranges):
        if remove[i]:
            out[-1][1] = ranges[i][1]
        else:
            out.append([ranges[i][0], ranges[i][1]])
    return out


def ranges_to_array(ranges):
    """(R, 2) int64 NumPy array view of a range list (query-plan broadcast form)."""
    if not ranges:
        return np.empty((0, 2), dtype=np.int64)
    return np.asarray(ranges, dtype=np.int64)

"""Sky regions (cone / convex polygon / ellipse) and their exact predicates.

Scalar (driver/planner-side) math uses plain Python floats in the same
operation order as the reference C code; batch predicates are vectorized
NumPy over (N, 3) arrays. Reference conformance targets:

- cone center/vec + cos(radius):   /root/reference/lib/src/sptQueryLib.c:60-73
- polygon normals + handedness:    sptQueryLib.c:636-699 (vCross/vNormalize path)
- htm_s2cpoly_init (cover poly):   /root/reference/lib/src/tinyhtm/src/geometry.c:369-427
- ellipse init (foci / cen+axes):  geometry.c:267-357
- membership tests F1-F3:          sptQueryLib.c:580,1219-1230; geometry.h:404-418;
                                   geometry.c:593-604
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .kernels import vec

RAD_PER_DEG = vec.RAD_PER_DEG
DEG_PER_RAD = vec.DEG_PER_RAD


# ---------------------------------------------------------------- scalar v3
def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _neg(a):
    return (-a[0], -a[1], -a[2])


def _mul(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _rcross(v1, v2):
    """htm_v3_rcross (geometry.h:203-216): 2x cross, robust for near-equal units."""
    x1 = v2[0] + v1[0]
    x2 = v2[0] - v1[0]
    y1 = v2[1] + v1[1]
    y2 = v2[1] - v1[1]
    z1 = v2[2] + v1[2]
    z2 = v2[2] - v1[2]
    return (y1 * z2 - z1 * y2, z1 * x2 - x1 * z2, x1 * y2 - y1 * x2)


def _norm(a):
    return math.sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2])


def _normalize(a):
    n = _norm(a)
    return (a[0] / n, a[1] / n, a[2] / n)


def _dist2(a, b):
    dx = a[0] - b[0]
    dy = a[1] - b[1]
    dz = a[2] - b[2]
    return dx * dx + dy * dy + dz * dz


def _midpoint(a, b):
    return _normalize(_add(a, b))


def radec_to_v3(ra, dec):
    """Scalar ra/dec (deg) -> normalized unit vector, in the exact order of
    sptConeSearch (sptQueryLib.c:67-73): trig, then htm_v3_normalize."""
    cos_dec = math.cos(dec * RAD_PER_DEG)
    x = math.cos(ra * RAD_PER_DEG) * cos_dec
    y = math.sin(ra * RAD_PER_DEG) * cos_dec
    z = math.sin(dec * RAD_PER_DEG)
    return _normalize((x, y, z))


def radec_to_v3_raw(ra, dec):
    """Unnormalized variant — the sptPolygonSearch 'poly' vertices
    (sptQueryLib.c:636-641) skip the normalize step."""
    cos_dec = math.cos(dec * RAD_PER_DEG)
    return (
        math.cos(ra * RAD_PER_DEG) * cos_dec,
        math.sin(ra * RAD_PER_DEG) * cos_dec,
        math.sin(dec * RAD_PER_DEG),
    )


# ---------------------------------------------------------------- regions
class RegionError(ValueError):
    """Raised for degenerate / non-convex region specifications (maps to the
    reference's status=1 + errorMsg returns)."""


@dataclass
class Cone:
    """Spherical cap: center (ra, dec) + radius, all degrees."""

    ra: float
    dec: float
    radius: float
    center: tuple = field(init=False)
    cosrad: float = field(init=False)
    dist2: float = field(init=False)

    def __post_init__(self):
        self.center = radec_to_v3(self.ra, self.dec)
        self.cosrad = math.cos(self.radius * RAD_PER_DEG)
        # square of secant distance: 4 sin^2(r/2)  (htm.c:1205-1207)
        s = math.sin(self.radius * 0.5 * RAD_PER_DEG)
        self.dist2 = 4.0 * s * s

    def mask(self, xyz: np.ndarray) -> np.ndarray:
        """Vectorized F1 over an (N, 3) array: x*cx + y*cy + z*cz >= cos(r),
        exactly the emitted geomConstraint (sptQueryLib.c:580)."""
        c = self.center
        return (
            xyz[:, 0] * c[0] + xyz[:, 1] * c[1] + xyz[:, 2] * c[2]
        ) >= self.cosrad


def polygon_normals(ra, dec, collect=None):
    """Handedness-corrected unit edge normals of a convex polygon, the exact
    sptPolygonSearch recipe (sptQueryLib.c:636-699): cross of consecutive
    *unnormalized* vertex vectors, normalized, flipped if clockwise.

    Raises RegionError on degenerate corners / non-convex input.
    Returns (poly_verts_raw, normals) as lists of tuples.

    ``collect``: optional list receiving one (pre_flip_normal, handedness,
    reversed) tuple per edge AS THE LOOP RUNS — on a RegionError the entries
    up to the failing edge are present, exactly matching the reference's
    debug-print prefix before its error return (the ``-d`` trace surface).
    """
    npoly = len(ra)
    poly = [radec_to_v3_raw(ra[i], dec[i]) for i in range(npoly)]
    normals = []
    flip = 1
    for i in range(npoly):
        nrm = _cross(poly[i], poly[(i + 1) % npoly])
        ln = _norm(nrm)
        if ln == 0.0:
            ln = 1.0  # vNormalize guard (sptQueryLib.c:2494-2510)
        nrm = (nrm[0] / ln, nrm[1] / ln, nrm[2] / ln)
        handedness = _dot(nrm, poly[(i + 2) % npoly])
        if collect is not None:
            collect.append((nrm, handedness, flip < 0 or (i == 0 and handedness < 0.0)))
        if abs(handedness) < 1.0e-10:
            raise RegionError("Degenerate polygon corner.")
        if i == 0 and handedness < 0.0:
            flip = -1
        if i > 0 and flip * handedness <= 0.0:
            raise RegionError("Polygon is not convex;")
        if flip < 0:
            nrm = _neg(nrm)
        normals.append(nrm)
    return poly, normals


@dataclass
class ConvexPolygon:
    """Convex spherical polygon; carries both the sptPolygonSearch normals
    (for the geom predicate) and the htm_s2cpoly form (for HTM coverage)."""

    ra: list
    dec: list
    normals: list = field(init=False)       # unit normals, geom predicate
    verts: list = field(init=False)         # normalized vertices (CCW order)
    edges: list = field(init=False)         # rcross edge planes (unnormalized)
    vsum: tuple = field(init=False)

    def __post_init__(self):
        _, self.normals = polygon_normals(self.ra, self.dec)
        # htm_s2cpoly_init (geometry.c:369-427) over *normalized* vertices
        # (sptQueryLib.c:703-713 normalizes before building the cpoly).
        n = len(self.ra)
        verts = [radec_to_v3(self.ra[i], self.dec[i]) for i in range(n)]
        vsum = verts[n - 1]
        edges = [None] * n
        for i in range(n - 1):
            edges[i] = _rcross(verts[i], verts[i + 1])
            vsum = _add(vsum, verts[i])
        edges[n - 1] = _rcross(verts[n - 1], verts[0])
        if _dot(vsum, edges[0]) < 0.0:
            # Clockwise input: reverse vertex order and rebuild edge planes
            # (geometry.c:407-418). The C code splices/negates the existing
            # edge array; since rcross is exactly antisymmetric under IEEE
            # negation, recomputing rcross over the reversed vertices is
            # bit-identical. vsum is NOT recomputed (C keeps the original).
            verts = verts[::-1]
            edges = [None] * n
            for i in range(n - 1):
                edges[i] = _rcross(verts[i], verts[i + 1])
            edges[n - 1] = _rcross(verts[n - 1], verts[0])
        self.verts = verts
        self.edges = edges
        self.vsum = vsum

    @property
    def n(self):
        return len(self.verts)

    def contains(self, v) -> bool:
        """htm_s2cpoly_cv3 (geometry.c:593-604): all edge dots >= 0."""
        return all(_dot(v, e) >= 0.0 for e in self.edges)

    def mask(self, xyz: np.ndarray) -> np.ndarray:
        """Vectorized F2 with the *geom-constraint* normals
        (sptQueryLib.c:1219-1230): AND over v . normal_i >= 0.
        Explicit mul/add chain (no BLAS matmul) so the float sequence is
        reproducible bit-for-bit by a SQL oracle."""
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        out = np.ones(len(xyz), dtype=bool)
        for n in self.normals:
            out &= (x * n[0] + y * n[1] + z * n[2]) >= 0.0
        return out


@dataclass
class Ellipse:
    """Spherical ellipse via the quadratic-form matrix (geometry.h:364-380)."""

    cen: tuple
    xx: float
    yy: float
    zz: float
    xy: float
    xz: float
    yz: float
    a: float

    @classmethod
    def from_foci(cls, f1, f2, a):
        """htm_s2ellipse_init (geometry.c:267-295)."""
        e = 0.5 * float(vec.angsepu(np.asarray(f1), np.asarray(f2)))
        if e > 90.0 - 2.777777777777777778e-6 or a <= e or a >= 180.0 - e:
            raise RegionError("invalid ellipse angles")
        cen = _normalize(_add(f1, f2))
        ss = math.sin(2.0 * RAD_PER_DEG * a)
        c = math.cos(2.0 * RAD_PER_DEG * a)
        ss *= ss
        return cls(
            cen=cen,
            xx=ss - f1[0] * f1[0] - f2[0] * f2[0] + 2.0 * c * f1[0] * f2[0],
            yy=ss - f1[1] * f1[1] - f2[1] * f2[1] + 2.0 * c * f1[1] * f2[1],
            zz=ss - f1[2] * f1[2] - f2[2] * f2[2] + 2.0 * c * f1[2] * f2[2],
            xy=c * (f1[0] * f2[1] + f1[1] * f2[0]) - f1[0] * f1[1] - f2[0] * f2[1],
            xz=c * (f1[0] * f2[2] + f1[2] * f2[0]) - f1[0] * f1[2] - f2[0] * f2[2],
            yz=c * (f1[1] * f2[2] + f1[2] * f2[1]) - f1[1] * f1[2] - f2[1] * f2[2],
            a=a,
        )

    @classmethod
    def from_center(cls, ra, dec, a, b, angle):
        """htm_s2ellipse_init2 (geometry.c:298-357): center + semi-axes + PA."""
        if (
            a <= 0.0
            or b <= 0.0
            or a > 90.0 - 2.777777777777777778e-6
            or b > 90.0 - 2.777777777777777778e-6
        ):
            raise RegionError("invalid ellipse axes")
        cen = radec_to_v3(ra, dec)
        a_deg = a
        ta = math.tan(RAD_PER_DEG * a)
        tb = math.tan(RAD_PER_DEG * b)
        ia = 1.0 / (ta * ta)
        ib = 1.0 / (tb * tb)
        north, east = _ne_basis(cen)
        s = math.sin(RAD_PER_DEG * angle)
        c = math.cos(RAD_PER_DEG * angle)
        nvec = _sub(_mul(north, c), _mul(east, s))
        evec = _add(_mul(north, s), _mul(east, c))
        return cls(
            cen=cen,
            xx=ia * nvec[0] * nvec[0] + ib * evec[0] * evec[0] - cen[0] * cen[0],
            yy=ia * nvec[1] * nvec[1] + ib * evec[1] * evec[1] - cen[1] * cen[1],
            zz=ia * nvec[2] * nvec[2] + ib * evec[2] * evec[2] - cen[2] * cen[2],
            xy=ia * nvec[0] * nvec[1] + ib * evec[0] * evec[1] - cen[0] * cen[1],
            xz=ia * nvec[0] * nvec[2] + ib * evec[0] * evec[2] - cen[0] * cen[2],
            yz=ia * nvec[1] * nvec[2] + ib * evec[1] * evec[2] - cen[1] * cen[2],
            a=a_deg,
        )

    def qf(self, v):
        return (
            self.xx * v[0] * v[0]
            + self.yy * v[1] * v[1]
            + self.zz * v[2] * v[2]
            + 2.0 * self.xy * v[0] * v[1]
            + 2.0 * self.xz * v[0] * v[2]
            + 2.0 * self.yz * v[1] * v[2]
        )

    def contains(self, v) -> bool:
        """htm_s2ellipse_cv3 (geometry.h:404-418)."""
        qf = self.qf(v)
        dp = _dot(self.cen, v)
        if self.a <= 90.0:
            return dp >= 0.0 and qf <= 0.0
        return dp >= 0.0 or qf >= 0.0

    def mask(self, xyz: np.ndarray) -> np.ndarray:
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        qf = (
            self.xx * x * x
            + self.yy * y * y
            + self.zz * z * z
            + 2.0 * self.xy * x * y
            + 2.0 * self.xz * x * z
            + 2.0 * self.yz * y * z
        )
        dp = x * self.cen[0] + y * self.cen[1] + z * self.cen[2]
        if self.a <= 90.0:
            return (dp >= 0.0) & (qf <= 0.0)
        return (dp >= 0.0) | (qf >= 0.0)


# htm_v3_convex tolerance constants (geometry.c:1170-1185)
_RCROSS_N2MIN = 4.0e-16
_SIN_MIN = 1.0e-10
_COS_MAX = 0.999999999999999


def v3_convex(points):
    """Exact port of htm_v3_convex (geometry.c:1188-1279): arbitrary-order
    convexity validation. Returns (result, degenerate): result is +1 for a
    convex counter-clockwise vertex chain, -1 for convex clockwise, 0 for
    non-convex / non-hemispherical / too-few vertices; degenerate is True
    where the C code reports HTM_EDEGEN (coincident or antipodal corners).
    """
    pts = [(float(p[0]), float(p[1]), float(p[2])) for p in points]
    n = len(pts)
    if n < 3:
        return 0, False
    if not hemispherical(pts):
        return 0, False
    cen = centroid(pts)
    p1 = _rcross(cen, pts[n - 1])
    n2 = _dot(p1, p1)
    if abs(n2) < _RCROSS_N2MIN:
        return 0, True
    cw = ccw = False
    wind = 0.0
    for end in range(n):
        beg = (n - 2) + end if end < 2 else end - 2
        mid = n - 1 if end == 0 else end - 1
        plane = _rcross(pts[mid], pts[end])
        n2 = _dot(plane, plane)
        if _dot(pts[mid], pts[end]) >= _COS_MAX or n2 < _RCROSS_N2MIN:
            return 0, True
        sq = math.sqrt(n2)
        plane = (plane[0] / sq, plane[1] / sq, plane[2] / sq)
        d = _dot(plane, pts[beg])
        if d > _SIN_MIN:
            if cw:
                return 0, False
            ccw = True
        elif d < -_SIN_MIN:
            if ccw:
                return 0, False
            cw = True
        # vertices must always wind around cen in the same direction
        d = _dot(plane, cen)
        if (d < _SIN_MIN and ccw) or (d > -_SIN_MIN and cw):
            return 0, False
        p2 = _rcross(cen, pts[end])
        n2 = _dot(p2, p2)
        if abs(n2) < _RCROSS_N2MIN:
            return 0, True
        wind += _angsep_scalar(p1, p2)
        p1 = p2
    # for convex polygons the closest multiple of 360 to the winding is 1
    if 180.0 < wind < 540.0:
        return (1 if ccw else -1), False
    return 0, False


@dataclass
class PaddedPolygon:
    """Convex polygon in the pure htm_s2cpoly form (verts + rcross edge
    planes + vsum) as produced by s2cpoly_pad — duck-compatible with
    ConvexPolygon for HTM coverage (cover._cpoly_classifier) and region
    filtering. Membership is htm_s2cpoly_cv3: AND over v . edge_i >= 0."""

    verts: list
    edges: list
    vsum: tuple

    @property
    def n(self):
        return len(self.verts)

    def contains(self, v) -> bool:
        return all(_dot(v, e) >= 0.0 for e in self.edges)

    def mask(self, xyz: np.ndarray) -> np.ndarray:
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        out = np.ones(len(xyz), dtype=bool)
        for e in self.edges:
            out &= (x * e[0] + y * e[1] + z * e[2]) >= 0.0
        return out


def cpoly_from_v3(verts) -> PaddedPolygon:
    """htm_s2cpoly_init (geometry.c:369-427) over given unit-vector
    vertices: rcross edge planes + vsum, with the clockwise-input reversal.
    Returns the pure cpoly form (no ra/dec round-trip — bit-preserving)."""
    n = len(verts)
    if n < 3:
        raise RegionError("polygon needs >= 3 vertices")
    vs = [(float(v[0]), float(v[1]), float(v[2])) for v in verts]
    vsum = vs[n - 1]
    edges = [None] * n
    for i in range(n - 1):
        edges[i] = _rcross(vs[i], vs[i + 1])
        vsum = _add(vsum, vs[i])
    edges[n - 1] = _rcross(vs[n - 1], vs[0])
    if _dot(vsum, edges[0]) < 0.0:
        vs = vs[::-1]
        edges = [None] * n
        for i in range(n - 1):
            edges[i] = _rcross(vs[i], vs[i + 1])
        edges[n - 1] = _rcross(vs[n - 1], vs[0])
    return PaddedPolygon(verts=vs, edges=edges, vsum=vsum)


def s2cpoly_pad(poly, r: float) -> PaddedPolygon:
    """Exact port of htm_s2cpoly_pad (geometry.c:645-719): grow a convex
    spherical polygon by radius ``r`` degrees — every point within r of the
    original polygon is inside the padded one. The natural pre-filter for
    polygon-vs-point radius joins (polygon grown by the join radius)."""
    if r < 0.0:
        raise RegionError("negative pad radius")
    if r == 0.0:
        return PaddedPolygon(
            verts=list(poly.verts), edges=list(poly.edges), vsum=tuple(poly.vsum)
        )
    ve = list(poly.verts)
    ed = list(poly.edges)
    n = len(ve)
    rot_edges = [None] * n
    # rotate edge plane normals outward
    for i in range(n):
        j = n - 1 if i == 0 else i - 1
        angle = _tanrot(ve[j], ve[i], r)
        tmp = _sub(ve[i], ve[j])
        rot_edges[j] = v3_rot(ed[j], tmp, angle)
    # new vertices: normalized intersections of consecutive rotated planes
    new_verts = [None] * n
    for i in range(n):
        j = n - 1 if i == 0 else i - 1
        v = _normalize(_rcross(rot_edges[j], rot_edges[i]))
        if _dot(v, ve[i]) < 0.0:
            v = _neg(v)
        new_verts[i] = v
    # the union of old and new vertices must stay hemispherical
    if not hemispherical(ve + new_verts):
        raise RegionError("pad radius too large (not hemispherical)")
    vsum = new_verts[n - 1]
    new_edges = [None] * n
    for i in range(n - 1):
        new_edges[i] = _rcross(new_verts[i], new_verts[i + 1])
        vsum = _add(vsum, new_verts[i])
    new_edges[n - 1] = _rcross(new_verts[n - 1], new_verts[0])
    return PaddedPolygon(verts=new_verts, edges=new_edges, vsum=vsum)


def contains_cap(region, centers: np.ndarray, pad_rad) -> np.ndarray:
    """(N,) bool: is the spherical cap (centers[i], pad_rad[i]) fully inside
    ``region``? The conservative fully-inside classifier behind count lower
    bounds — INSIDE semantics of htm_tree_s2circle_range / s2cpoly_range
    (/root/reference/lib/src/tinyhtm/src/htm.c:1943-2057).

    pad_rad: scalar or (N,) array of cap radii in radians (a cell is fully
    inside the region if the cap covering it is).
    - Cone: angsep(center, cone center) + pad <= cone radius.
    - ConvexPolygon: sin(distance) to every inward edge plane >= sin(pad).
    - Ellipse: returns all-False (the reference provides tree ranges only
      for circle/cpoly; a 0 lower bound stays correct).
    """
    centers = np.asarray(centers, dtype=np.float64)
    pad_rad = np.asarray(pad_rad, dtype=np.float64)
    if isinstance(region, Cone):
        c = np.asarray(region.center)
        d = np.clip(
            centers[:, 0] * c[0] + centers[:, 1] * c[1] + centers[:, 2] * c[2],
            -1.0,
            1.0,
        )
        return np.arccos(d) + pad_rad <= region.radius * RAD_PER_DEG
    if isinstance(region, ConvexPolygon):
        sp = np.sin(np.minimum(pad_rad, math.pi / 2.0))
        out = np.ones(len(centers), dtype=bool)
        for n in region.normals:
            out &= (
                centers[:, 0] * n[0] + centers[:, 1] * n[1] + centers[:, 2] * n[2]
            ) >= sp
        return out
    return np.zeros(len(centers), dtype=bool)


def _ne_basis(v):
    """North/east unit basis at v — htm_v3_ne (geometry.c:24-48)."""
    x, y, z = v
    north = (-x * z, -y * z, x * x + y * y)
    if north[0] == 0.0 and north[1] == 0.0 and north[2] == 0.0:
        # at a pole: arbitrary orthogonal basis with z = 0
        return (-1.0, north[1], north[2]), (0.0, 1.0, 0.0)
    north = _normalize(north)
    east = _normalize(_rcross(north, v))
    return north, east


HTM_RMAX = 90.0 - 0.001 / 3600.0


def _tanrot(v1, v2, r):
    """htm_v3_tanrot (geometry.c:54-82): rotation angle making the (v1,v2)
    great-circle plane tangent to radius-r circles at v1 and v2."""
    a = _angsep_scalar(v1, v2)
    if a == 0.0:
        raise RegionError("degenerate edge")
    if a + 2.0 * r > 2.0 * HTM_RMAX:
        raise RegionError("radius too large")
    rr = r * RAD_PER_DEG
    aa = a * RAD_PER_DEG
    s = 2.0 * math.sin(rr) * math.sin(0.5 * aa) / math.sin(aa)
    if s >= 1.0:
        return 90.0
    return math.asin(s) * DEG_PER_RAD


def _angsep_scalar(v1, v2):
    n = _cross(v1, v2)
    ss = _norm(n)
    cs = _dot(v1, v2)
    if cs == 0.0 and ss == 0.0:
        return 0.0
    a = math.atan2(ss, cs) * DEG_PER_RAD
    return min(a, 180.0)


def polygon_box(ra, dec, width, height, angle=0.0) -> "ConvexPolygon":
    """Lat/lon box polygon — htm_s2cpoly_box (geometry.c:429-484)."""
    if width <= 0.0 or height <= 0.0 or width >= HTM_RMAX or height >= HTM_RMAX:
        raise RegionError("invalid box dimensions")
    cen = radec_to_v3(ra, dec)
    north, east = _ne_basis(cen)
    edges = [None] * 4
    edges[0] = v3_rot(east, north, 0.5 * width)
    edges[2] = v3_rot(east, north, -0.5 * width)
    edges[1] = v3_rot(north, east, -0.5 * height)
    edges[3] = v3_rot(north, east, 0.5 * height)
    verts = [
        _normalize(_rcross(edges[0], edges[1])),
        _normalize(_rcross(edges[2], edges[1])),
        _normalize(_rcross(edges[2], edges[3])),
        _normalize(_rcross(edges[0], edges[3])),
    ]
    if angle != 0.0:
        verts = [v3_rot(v, cen, angle) for v in verts]
    return _poly_from_verts(verts)


def polygon_ngon(ra, dec, r, n) -> "ConvexPolygon":
    """N-gon inscribed in a circle — htm_s2cpoly_ngon (geometry.c:489-550)."""
    if r <= 0.0 or r >= HTM_RMAX or n < 3:
        raise RegionError("invalid ngon parameters")
    cen = radec_to_v3(ra, dec)
    north, east = _ne_basis(cen)
    sr = math.sin(r * RAD_PER_DEG)
    cr = math.cos(r * RAD_PER_DEG)
    verts = []
    for i in range(n):
        ang = (RAD_PER_DEG * 360.0 * i) / n
        sa, ca = math.sin(ang), math.cos(ang)
        v = (
            ca * north[0] + sa * east[0],
            ca * north[1] + sa * east[1],
            ca * north[2] + sa * east[2],
        )
        verts.append(
            _normalize((cr * cen[0] + sr * v[0], cr * cen[1] + sr * v[1], cr * cen[2] + sr * v[2]))
        )
    return _poly_from_verts(verts)


def polygon_line(ra1, dec1, ra2, dec2, r) -> "ConvexPolygon":
    """Line segment padded by radius r — htm_s2cpoly_line (geometry.c:553-589)."""
    v1 = radec_to_v3(ra1, dec1)
    v2 = radec_to_v3(ra2, dec2)
    a = _tanrot(v1, v2, r)
    axis1 = _sub(v1, v2)
    axis2 = _rcross(v1, v2)
    edges = [None] * 4
    edges[0] = v3_rot(axis2, axis1, a)
    edges[1] = v3_rot(_rcross(v1, axis2), axis2, -r)
    edges[2] = v3_rot(axis2, axis1, -a)
    edges[3] = v3_rot(_rcross(v2, axis2), axis2, r)
    verts = [
        _normalize(_rcross(edges[0], edges[1])),
        _normalize(_rcross(edges[2], edges[1])),
        _normalize(_rcross(edges[2], edges[3])),
        _normalize(_rcross(edges[0], edges[3])),
    ]
    return _poly_from_verts(verts)


def _poly_from_verts(verts) -> "ConvexPolygon":
    """Build a ConvexPolygon from unit-vector vertices (converts back to
    ra/dec for the sptPolygonSearch-style normal derivation)."""
    import numpy as _np

    arr = _np.asarray(verts)
    lon, lat = vec.v3_to_sc(arr)
    return ConvexPolygon(list(map(float, lon)), list(map(float, lat)))


# Megiddo linear-programming hemisphericity test — exact port of
# htm_v3_hemispherical (geometry.c:722-1186). Decides whether the linear
# system { p . w > 0 for all points p } has a solution w by fixing
# w.z = +-1 (2D LP), then w.y = +-1 (1D), then the x-axis sign check.
_DBL_MIN = 2.2250738585072014e-308
_DBL_EPS = 2.220446049250313e-16
_INF = float("inf")


def _lp_env(constraints: list, x: float, upper: bool):
    """_htm_g (upper=True -> max envelope) / _htm_h (geometry.c:758-817):
    envelope value at x plus the min/max slopes attaining it."""
    a0, b0 = constraints[0]
    v = a0 * x + b0
    amin = amax = a0
    for ai, bi in constraints[1:]:
        vi = ai * x + bi
        if vi == v:
            if ai < amin:
                amin = ai
            if ai > amax:
                amax = ai
        elif (vi > v) if upper else (vi < v):
            v = vi
            amin = ai
            amax = ai
    return v, amin, amax


def _lp_prune(intersections: list, constraints: list, xr: list, g_side: bool):
    """_htm_prune_g / _htm_prune_h (geometry.c:821-931): pair up
    constraints, drop the dominated one of each pair whose intersection
    falls outside (xr[0], xr[1]), collect interior intersections. Mutates
    ``constraints`` with the same swap-with-last order as the C code."""
    i = 0
    n = len(constraints) - 1
    while i < n:
        a1, b1 = constraints[i]
        a2, b2 = constraints[i + 1]
        da = a1 - a2
        if abs(da) < _DBL_MIN / _DBL_EPS:
            xx = _INF
        else:
            xx = (b2 - b1) / da
        if xx != xx or (xx != 0.0 and xx == 2 * xx):  # HTM_ISSPECIAL
            if (b1 > b2) if g_side else (b1 < b2):
                constraints[i + 1] = constraints[n]
            else:
                constraints[i] = constraints[n]
            n -= 1
        elif xx <= xr[0]:
            if (a1 > a2) if g_side else (a1 < a2):
                constraints[i + 1] = constraints[n]
            else:
                constraints[i] = constraints[n]
            n -= 1
        elif xx >= xr[1]:
            if (a1 > a2) if g_side else (a1 < a2):
                constraints[i] = constraints[n]
            else:
                constraints[i + 1] = constraints[n]
            n -= 1
        else:
            intersections.append(xx)
            i += 2
    del constraints[n + 1 :]


def _feasible_2d(points, z: float) -> bool:
    """_htm_feasible_2d (geometry.c:930-1026)."""
    xr = [-_INF, _INF]
    I1: list = []
    I2: list = []
    for px, py, pz in points:
        if abs(py) <= _DBL_MIN:
            if abs(px) <= _DBL_MIN:
                if z * pz <= 0.0:
                    return False
            else:
                xlim = -z * pz / px
                if px > 0.0:
                    if xlim > xr[0]:
                        xr[0] = xlim
                else:
                    if xlim < xr[1]:
                        xr[1] = xlim
                if xr[1] <= xr[0]:
                    return False
        else:
            coeffs = (-px / py, -z * pz / py)
            (I1 if py > 0.0 else I2).append(coeffs)
    if not I1 or not I2:
        return True
    while True:
        intersections: list = []
        _lp_prune(intersections, I1, xr, True)
        _lp_prune(intersections, I2, xr, False)
        if not intersections:
            a1, b1 = I1[0]
            a2, b2 = I2[0]
            da = a1 - a2
            xi = (b2 - b1) / da if da != 0.0 else _INF
            if xi != xi or (xi != 0.0 and xi == 2 * xi):
                return b1 < b2
            return (xi > xr[0] or a1 < a2) and (xi < xr[1] or a1 > a2)
        ni = len(intersections)
        med = sorted(intersections)[ni >> 1]  # k-th order statistic, as
        # htm_select(intersections, ni, ni >> 1) computes (select.c)
        g = _lp_env(I1, med, True)
        h = _lp_env(I2, med, False)
        if g[0] <= h[0]:
            return True
        elif g[1] > h[2]:
            xr[1] = med
        elif g[2] < h[1]:
            xr[0] = med
        else:
            return False


def _feasible_1d(points, y: float) -> bool:
    """_htm_feasible_1d (geometry.c:1029-1057)."""
    xmin, xmax = -_INF, _INF
    for px, py, _ in points:
        if abs(px) <= _DBL_MIN:
            if y * py <= 0.0:
                return False
        else:
            xlim = -y * py / px
            if px > 0.0:
                if xlim > xmin:
                    xmin = xlim
            elif xlim < xmax:
                xmax = xlim
            if xmax <= xmin:
                return False
    return True


def hemispherical(points) -> bool:
    """True if all points fit in some open hemisphere (necessary for a
    convex spherical polygon) — EXACT port of htm_v3_hemispherical
    (geometry.c:1060-1186): Megiddo 2D LP feasibility at z = +-1, 1D at
    y = +-1, then the x-sign degenerate case."""
    pts = [(float(p[0]), float(p[1]), float(p[2])) for p in points]
    if not pts:
        return False
    if _feasible_2d(pts, 1.0) or _feasible_2d(pts, -1.0):
        return True
    if _feasible_1d(pts, 1.0) or _feasible_1d(pts, -1.0):
        return True
    pos = neg = False
    for px, _, _ in pts:
        if px > 0.0:
            if neg:
                return False
            pos = True
        elif px < 0.0:
            if pos:
                return False
            neg = True
        else:
            return False
    return True


def polygon_hull(ra, dec) -> "ConvexPolygon":
    """Convex hull of a hemispherical point set, as a ConvexPolygon —
    functional equivalent of htm_s2cpoly_hull (geometry.c:1388-1603):
    angular sort around the centroid, then Graham-scan-style elimination of
    reflex vertices on the sphere."""
    pts = [radec_to_v3(r, d) for r, d in zip(ra, dec)]
    if len(pts) < 3:
        raise RegionError("hull needs >= 3 points")
    if not hemispherical(pts):
        raise RegionError("points are not hemispherical")
    cen = centroid(pts)
    north, east = _ne_basis(cen)
    ang = [
        math.atan2(_dot(p, east), _dot(p, north)) for p in pts
    ]
    order = sorted(range(len(pts)), key=lambda i: ang[i])
    ring = [pts[i] for i in order][::-1]  # CCW viewed from outside
    # Graham scan on the sphere: stack-based left-turn filter over the
    # angularly sorted ring, then closure passes for the wrap-around edges.
    hull: list = []
    for p in ring:
        while len(hull) >= 2 and _dot(_rcross(hull[-2], hull[-1]), p) <= 0.0:
            hull.pop()
        hull.append(p)
    stable = False
    while not stable and len(hull) >= 3:
        stable = True
        if _dot(_rcross(hull[-2], hull[-1]), hull[0]) <= 0.0:
            hull.pop()
            stable = False
            continue
        if _dot(_rcross(hull[-1], hull[0]), hull[1]) <= 0.0:
            hull.pop(0)
            stable = False
    ring = hull
    if len(ring) < 3:
        raise RegionError("degenerate hull")
    lon, lat = vec.v3_to_sc(np.asarray(ring))
    return ConvexPolygon(list(map(float, lon)), list(map(float, lat)))


def polygon_area(poly: "ConvexPolygon") -> float:
    """Solid angle (steradians) via Girard's theorem — htm_s2cpoly_area
    (geometry.c:606-625)."""
    n = poly.n
    asum = 0.0
    for i in range(n):
        j = n - 1 if i == 0 else i - 1
        v = _rcross(poly.edges[j], poly.edges[i])
        sina = 0.5 * _norm(v)
        cosa = -_dot(poly.edges[j], poly.edges[i])
        asum += math.atan2(sina, cosa)
    return asum - (n - 2) * math.pi


def centroid(points) -> tuple:
    """Normalized vector sum — htm_v3_centroid (geometry.c:115-133).
    points: (N, 3) array or list of tuples."""
    arr = np.asarray(points, dtype=np.float64)
    s = arr.sum(axis=0)
    return _normalize((float(s[0]), float(s[1]), float(s[2])))


def v3_rot(v, k, angle_deg):
    """Rodrigues rotation of v around axis k — htm_v3_rot (geometry.c:85-112)."""
    nk = _norm(k)
    if nk == 0.0:
        raise RegionError("zero-norm rotation axis")
    sina = math.sin(angle_deg * RAD_PER_DEG)
    cosa = math.cos(angle_deg * RAD_PER_DEG)
    kdotv = _dot(k, v) / nk
    kxv = _mul(_rcross(k, v), 0.5 * sina / nk)
    out = _add(kxv, _mul(v, cosa))
    return _add(out, _mul(k, kdotv * (1.0 - cosa)))

"""Drop-in SpatialIndex Python API.

Mirrors the reference's Cython wrapper (/root/reference/spatial_index.pyx:25-189)
and the C entry points sptConeSearch / sptPolygonSearch
(/root/reference/lib/src/sptQueryLib.c:14-586, 590-1236): same parameters,
same defaulting rules, same return dictionaries, byte-identical constraint
strings.
"""

from __future__ import annotations

import math

import numpy as np

from . import cover, geom, sqlcompat

MAX_QUERY_LEVEL = 20  # sptQueryLib.c:50-57


class SpatialIndex:
    """Region -> (index_constraint, geom_constraint) SQL-fragment planner.

    The class also exposes the structured plan (`cone_plan` / `polygon_plan`)
    that the Ray Data engine consumes directly: a sorted (R, 2) int64 range
    array plus the exact geometric predicate coefficients.
    """

    HTM = 0
    HPX = 1

    BASE10 = 0
    BASE4 = 1

    def __init__(self):
        pass

    # ------------------------------------------------------------ planning
    @staticmethod
    def _resolve_colname(mode, level, colname, encoding):
        """Defaulting rules of spatial_index.pyx:89-102."""
        if colname is None:
            if encoding is None:
                encoding = SpatialIndex.BASE4
                colname = "spt_ind"
            else:
                colname = ("htm" if mode == 0 else "hpx") + str(level)
        if encoding is None:
            encoding = SpatialIndex.BASE10
        return colname, encoding

    def cone_search(
        self,
        ra,
        dec,
        radius,
        mode=0,
        level=7,
        xcol="x",
        ycol="y",
        zcol="z",
        colname=None,
        encoding=None,
    ):
        colname, encoding = self._resolve_colname(mode, level, colname, encoding)
        if level > MAX_QUERY_LEVEL:
            return {
                "status": 1,
                "error_message": "Indexing level cannot be greater than 20 (which is already sub-arcsecond).",
            }
        cone = geom.Cone(ra, dec, radius)
        if mode == self.HTM:
            ranges = cover.htm_circle_ranges(cone.center, radius, level)
            quirk = False
        else:
            ranges = cover.hpx_cone_ranges(level, ra, dec, radius)
            quirk = False
        if len(ranges) <= 0:
            # sptQueryLib.c:109-116 / :374-380
            kind = "HTM" if mode == self.HTM else "HEALPix"
            return {
                "status": 1,
                "error_message": f"No {kind} ranges found (a physical impossibility so there is a bug in the code).",
            }
        ranges = cover.gap_compress(ranges)
        index_constraint = sqlcompat.render_index_constraint(
            ranges, colname, encoding if mode == self.HTM else sqlcompat.DECIMAL,
            hpx_polygon_quirk=quirk,
        )
        geom_constraint = sqlcompat.render_cone_geom(
            cone.center, cone.cosrad, xcol, ycol, zcol
        )
        return {
            "status": 0,
            "index_constraint": index_constraint,
            "geom_constraint": geom_constraint,
        }

    def polygon_search(
        self,
        npoly,
        ra,
        dec,
        mode=0,
        level=7,
        xcol="x",
        ycol="y",
        zcol="z",
        colname=None,
        encoding=None,
    ):
        colname, encoding = self._resolve_colname(mode, level, colname, encoding)
        try:
            _, normals = geom.polygon_normals(ra, dec)
            if mode == self.HTM:
                poly = geom.ConvexPolygon(list(ra), list(dec))
                ranges = cover.htm_polygon_ranges(poly, level)
                quirk = False
            else:
                ranges = cover.hpx_polygon_ranges(level, ra, dec)
                quirk = True
        except geom.RegionError as e:
            return {"status": 1, "error_message": str(e)}
        if len(ranges) <= 0:
            kind = "HTM" if mode == self.HTM else "HEALPix"
            return {
                "status": 1,
                "error_message": f"No {kind} ranges found (a physical impossibility so there is a bug in the code).",
            }
        ranges = cover.gap_compress(ranges)
        index_constraint = sqlcompat.render_index_constraint(
            ranges, colname, encoding if mode == self.HTM else sqlcompat.DECIMAL,
            hpx_polygon_quirk=quirk,
        )
        geom_constraint = sqlcompat.render_polygon_geom(normals, xcol, ycol, zcol)
        return {
            "status": 0,
            "index_constraint": index_constraint,
            "geom_constraint": geom_constraint,
        }

    # ------------------------------------------- structured plans (engine)
    def cone_plan(self, ra, dec, radius, mode=0, level=7, compress=True):
        """Structured query plan for the Ray engine: dict with the sorted
        (R, 2) int64 range array (possibly gap-compressed — a superset cover)
        and exact predicate coefficients."""
        cone = geom.Cone(ra, dec, radius)
        if mode == self.HTM:
            ranges = cover.htm_circle_ranges(cone.center, radius, level)
        else:
            ranges = cover.hpx_cone_ranges(level, ra, dec, radius)
        if compress:
            ranges = cover.gap_compress(ranges)
        return {
            "kind": "cone",
            "mode": mode,
            "level": level,
            "ranges": cover.ranges_to_array(ranges),
            "region": cone,
        }

    def ellipse_plan(self, ra, dec, a, b, angle, level=7, compress=True):
        """HTM ellipse query plan (htm_s2ellipse_ids path; HPX has no ellipse
        decomposition in the reference either)."""
        ell = geom.Ellipse.from_center(ra, dec, a, b, angle)
        ranges = cover.htm_ellipse_ranges(ell, level)
        if compress:
            ranges = cover.gap_compress(ranges)
        return {
            "kind": "ellipse",
            "mode": self.HTM,
            "level": level,
            "ranges": cover.ranges_to_array(ranges),
            "region": ell,
        }

    def cone_plan_s2(self, ra, dec, radius, level=10):
        """S2-mode cone plan (engine addition per north_star: H3/S2 alongside
        HTM/HEALPix): uint64 leaf-id ranges from the vectorized BFS cap
        cover (kernels/s2.cap_cover_ranges) + the exact cone predicate."""
        from .kernels import s2 as s2k

        cone = geom.Cone(ra, dec, radius)
        ranges = s2k.cap_cover_ranges(
            np.asarray(cone.center), radius * geom.RAD_PER_DEG, level
        )
        return {
            "kind": "cone",
            "mode": 2,
            "level": level,
            "ranges": ranges,
            "region": cone,
        }

    def polygon_plan_s2(self, ra, dec, level=10):
        """S2-mode convex-polygon plan: leaf ranges from the cover of the
        polygon's bounding cap (center = normalized vertex sum, radius = max
        vertex separation) + the exact edge-normal predicate."""
        from .kernels import s2 as s2k
        from .kernels import vec as veck

        poly = geom.ConvexPolygon(list(ra), list(dec))
        cen = np.asarray(geom._normalize(poly.vsum))
        rad = 0.0
        for v in poly.verts:
            rad = max(rad, float(veck.angsepu(cen, np.asarray(v))))
        ranges = s2k.cap_cover_ranges(cen, rad * geom.RAD_PER_DEG, level)
        return {
            "kind": "polygon",
            "mode": 2,
            "level": level,
            "ranges": ranges,
            "region": poly,
        }

    def padded_polygon_plan(self, ra, dec, pad_deg, level=7, compress=True):
        """Plan for a polygon GROWN by ``pad_deg`` degrees (htm_s2cpoly_pad,
        geometry.c:645-719) — the natural pre-filter for polygon-vs-point
        radius joins. HTM mode only (the padded region is a pure cpoly;
        membership is the htm_s2cpoly_cv3 edge test)."""
        base = geom.ConvexPolygon(list(ra), list(dec))
        padded = geom.s2cpoly_pad(base, pad_deg)
        ranges = cover.htm_polygon_ranges(padded, level)
        if compress:
            ranges = cover.gap_compress(ranges)
        return {
            "kind": "padded_polygon",
            "mode": self.HTM,
            "level": level,
            "ranges": cover.ranges_to_array(ranges),
            "region": padded,
        }

    def polygon_plan(self, ra, dec, mode=0, level=7, compress=True):
        polyregion = geom.ConvexPolygon(list(ra), list(dec))
        if mode == self.HTM:
            ranges = cover.htm_polygon_ranges(polyregion, level)
        else:
            # engine plans need a true superset cover -> compat=False
            # (see cover.hpx_polygon_ranges docstring)
            ranges = cover.hpx_polygon_ranges(level, ra, dec, compat=False)
        if compress:
            ranges = cover.gap_compress(ranges)
        return {
            "kind": "polygon",
            "mode": mode,
            "level": level,
            "ranges": cover.ranges_to_array(ranges),
            "region": polyregion,
        }

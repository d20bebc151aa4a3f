"""Byte-identical SQL constraint-string rendering (compat surface).

Reproduces the reference's indexConstraint / geomConstraint text exactly,
including formatting quirks. Targets:

- HTM/HPX cone singles+ranges:  /root/reference/lib/src/sptQueryLib.c:254-345,499-546
- cone geom predicate:          sptQueryLib.c:580  (%.12f coeffs, %.12e threshold)
- HTM/HPX polygon rendering:    sptQueryLib.c:880-971,1130-1177
- HPX-polygon single-cell literal padding quirk: sptQueryLib.c:1147-1149
- polygon geom half-spaces:     sptQueryLib.c:1219-1230
- BASE4 via htm_idtodec:        /root/reference/lib/src/tinyhtm/src/htm.c:1562-1579
"""

from __future__ import annotations

from .kernels import htm as htmk

DECIMAL = 0
BASE4 = 1


def _enc(v: int, encoding: int) -> int:
    return int(htmk.id_to_dec(v)) if encoding == BASE4 else int(v)


def render_index_constraint(ranges, indname, encoding=DECIMAL, hpx_polygon_quirk=False):
    """Render the OR-chain of (col = v) / (col BETWEEN lo AND hi) terms.

    hpx_polygon_quirk: the HPX-polygon path emits single-cell terms with the
    debug-print literal padding ("      (" / "   OR (") — sptQueryLib.c:1147-1149.
    """
    parts = []
    for i, (lo, hi) in enumerate(ranges):
        if lo == hi:
            if hpx_polygon_quirk:
                if i == 0:
                    parts.append(f"      ({indname} = {_enc(lo, encoding)})")
                else:
                    parts.append(f"   OR ({indname} = {_enc(lo, encoding)})")
            else:
                if i == 0:
                    parts.append(f"({indname} = {_enc(lo, encoding)})")
                else:
                    parts.append(f" OR ({indname} = {_enc(lo, encoding)})")
        else:
            if i == 0:
                parts.append(
                    f"({indname} BETWEEN {_enc(lo, encoding)} AND {_enc(hi, encoding)})"
                )
            else:
                parts.append(
                    f" OR ({indname} BETWEEN {_enc(lo, encoding)} AND {_enc(hi, encoding)})"
                )
    return "".join(parts)


def render_cone_geom(center, cosrad, xcol="x", ycol="y", zcol="z"):
    """sptQueryLib.c:580."""
    return (
        f"({center[0]:.12f}*{xcol})+({center[1]:.12f}*{ycol})"
        f"+({center[2]:.12f}*{zcol})>={cosrad:.12e}"
    )


def render_polygon_geom(normals, xcol="x", ycol="y", zcol="z"):
    """sptQueryLib.c:1219-1230: AND-joined half-space terms ending in '>=0.'."""
    parts = [
        f"({normals[0][0]:.12f}*{xcol})+({normals[0][1]:.12f}*{ycol})"
        f"+({normals[0][2]:.12f}*{zcol})>=0."
    ]
    for nrm in normals[1:]:
        parts.append(
            f" AND ({nrm[0]:.12f}*{xcol})+({nrm[1]:.12f}*{ycol})"
            f"+({nrm[2]:.12f}*{zcol})>=0."
        )
    return "".join(parts)

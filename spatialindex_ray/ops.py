"""Dataset -> Dataset spatial operators (the Ray-Data-native engine core).

Every operator is a composable function over ``ray.data.Dataset`` built from
``map_batches(batch_format="pyarrow")`` + vectorized NumPy kernels, with
``groupby`` only for genuinely wide steps (cell joins). Query plans (range
arrays, predicate coefficients) are tiny driver-side objects captured in task
closures — Ray ships them once per task, not per batch.

Scale notes (100 TB / 10^12 rows):
- encode is stateless + deterministic => lineage retries are exact.
- semi-joins never shuffle: broadcast plan + vectorized searchsorted filter.
- the radius join shuffles only (cell, id, x, y, z) — never text/html
  payloads; re-attach wide columns by id-join against the source afterwards.
- per-point candidate cells come from the 3x3 HEALPix neighbor patch, so the
  probe side is duplicated at most 9x; partitioning assumption: join radius
  theta <= SAFE_RADIUS(order) (see safe_join_order).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import geom
from .kernels import healpix, htm as htmk, vec

# Position-derivation constants. The doc_id-based derivation is restricted to
# +,*,fmod,sin,cos — ops that are bit-identical between NumPy, libm and
# DuckDB here — so DuckDB oracle queries can reproduce positions exactly.
POS_C1 = 0.6180339887498949   # frac(golden ratio)
POS_C2 = 0.7548776662466927   # frac(plastic-number based)
RAD = 0.017453292519943295
DEG = 57.29577951308232


def positions_from_id(ids: np.ndarray):
    """Deterministic sky position from an integer id column.

    lon = 360 * fmod(id * C1, 1);  lat = 180 * fmod(id * C2, 1) - 90.
    SQL-expressible bit-exactly (see oracle_sql in __ray_entry__).
    """
    ids = np.asarray(ids, dtype=np.int64)
    lon = 360.0 * np.fmod(ids * POS_C1, 1.0)
    lat = 180.0 * np.fmod(ids * POS_C2, 1.0) - 90.0
    return lon, lat


def positions_from_url(urls) -> tuple[np.ndarray, np.ndarray]:
    """FIXTURES.md §1: h = sha1(url); u1 = h[0:8]/2^64, u2 = h[8:16]/2^64;
    lon = 360*u1, lat = degrees(asin(2*u2 - 1)) — uniform on the sphere.
    Engine columns derive from url alone => idempotent partition recompute."""
    n = len(urls)
    raw = np.empty((n, 2), dtype=np.uint64)
    sha1 = hashlib.sha1
    for i, u in enumerate(urls):
        d = sha1(u.encode() if isinstance(u, str) else u).digest()
        raw[i, 0] = int.from_bytes(d[0:8], "big")
        raw[i, 1] = int.from_bytes(d[8:16], "big")
    u = raw.astype(np.float64) / 18446744073709551616.0  # 2^64
    lon = 360.0 * u[:, 0]
    lat = np.degrees(np.arcsin(2.0 * u[:, 1] - 1.0))
    return lon, lat


def xyz_from_lonlat(lon, lat):
    """lon/lat deg -> normalized unit vectors, sptIndx order (sptIndx.c:196-204)."""
    return vec.normalize(vec.sc_to_v3(lon, lat))


# ------------------------------------------------------------------ encode
def encode_batch(
    tbl: pa.Table,
    *,
    id_col: str | None = None,
    url_col: str | None = None,
    lon_col: str | None = None,
    lat_col: str | None = None,
    htm_level: int | None = 20,
    hpx_level: int | None = 20,
    keep_xyz: bool = True,
    keep_lonlat: bool = True,
) -> pa.Table:
    """The backbone per-batch encoder (mirrors sptIndx row loop,
    /root/reference/src/sptIndx.c:182-246, as one vectorized pass):
    derive/read lon+lat, append x,y,z float64 and htm{L}/hpx{L} int64.

    Coarser levels are derived downstream by bit-shift
    (htm20 >> 2*(20-L) == htmL), so only the finest level is stored.
    """
    if lon_col is not None:
        lon = tbl[lon_col].to_numpy(zero_copy_only=False)
        lat = tbl[lat_col].to_numpy(zero_copy_only=False)
    elif url_col is not None:
        lon, lat = positions_from_url(tbl[url_col].to_pylist())
    else:
        lon, lat = positions_from_id(tbl[id_col].to_numpy(zero_copy_only=False))
    v = xyz_from_lonlat(lon, lat)
    cols = dict(zip(tbl.column_names, tbl.columns))
    if keep_lonlat and lon_col is None:
        cols["lon"] = pa.array(lon)
        cols["lat"] = pa.array(lat)
    if keep_xyz:
        cols["x"] = pa.array(v[:, 0])
        cols["y"] = pa.array(v[:, 1])
        cols["z"] = pa.array(v[:, 2])
    if htm_level is not None:
        cols[f"htm{htm_level}"] = pa.array(htmk.v3_id(v, htm_level))
    if hpx_level is not None:
        cols[f"hpx{hpx_level}"] = pa.array(healpix.sky2hpx(hpx_level, lon, lat))
    return pa.table(cols)


def encode(ds, **kw):
    """Dataset flavor of encode_batch; stateless, embarrassingly parallel."""
    return ds.map_batches(
        lambda tbl: encode_batch(tbl, **kw), batch_format="pyarrow"
    )


# ------------------------------------------------------- range semi-join (F4)
def ranges_mask(cells: np.ndarray, ranges: np.ndarray) -> np.ndarray:
    """Vectorized index-range membership: cell in any [lo, hi]?
    O(log R) per row via searchsorted on the sorted range starts — the
    engine form of the reference's OR-of-BETWEEN index constraint
    (sptQueryLib.c:254-345)."""
    if len(ranges) == 0:
        return np.zeros(len(cells), dtype=bool)
    idx = np.searchsorted(ranges[:, 0], cells, side="right") - 1
    ok = idx >= 0
    out = np.zeros(len(cells), dtype=bool)
    out[ok] = cells[ok] <= ranges[idx[ok], 1]
    return out


def region_filter_batch(tbl: pa.Table, plan, cell_col: str, shift: int) -> pa.Table:
    """Apply index semi-join (cell ranges at plan level via >> shift) then the
    exact geometric predicate over (x, y, z). Plan is the broadcast small
    side of the only 'join' the reference engine has (SURVEY §2.6 J1)."""
    cells = tbl[cell_col].to_numpy(zero_copy_only=False)
    if shift:
        cells = cells >> shift
    m = ranges_mask(cells, plan["ranges"])
    if not m.any():
        return tbl.slice(0, 0)
    sub = tbl.filter(pa.array(m))
    xyz = np.column_stack(
        [
            sub["x"].to_numpy(zero_copy_only=False),
            sub["y"].to_numpy(zero_copy_only=False),
            sub["z"].to_numpy(zero_copy_only=False),
        ]
    )
    gm = plan["region"].mask(xyz)
    return sub.filter(pa.array(gm))


def region_search(ds, plan, *, cell_col=None, data_level=20):
    """cone_search / polygon_search over an encoded Dataset: broadcast the
    plan, filter each batch (no shuffle). Returns the matching rows."""
    if cell_col is None:
        cell_col = ("htm" if plan["mode"] == 0 else "hpx") + str(data_level)
    shift = 2 * (data_level - plan["level"])
    return ds.map_batches(
        lambda tbl: region_filter_batch(tbl, plan, cell_col, shift),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------------- tiling
def tile_assign_batch(tbl: pa.Table, tile_deg: float, lon_col="lon", lat_col="lat"):
    """Raster-grid tile assignment: tile_x = floor(lon/tile_deg),
    tile_y = floor((lat+90)/tile_deg), tile_id = tile_y*nx + tile_x.
    Pure float64 mult/floor => SQL-expressible bit-exactly."""
    lon = tbl[lon_col].to_numpy(zero_copy_only=False)
    lat = tbl[lat_col].to_numpy(zero_copy_only=False)
    nx = int(math.ceil(360.0 / tile_deg))
    tx = np.floor(lon / tile_deg).astype(np.int64)
    ty = np.floor((lat + 90.0) / tile_deg).astype(np.int64)
    return tbl.append_column("tile_id", pa.array(ty * nx + tx))


def tile_assign(ds, tile_deg: float, **kw):
    return ds.map_batches(
        lambda t: tile_assign_batch(t, tile_deg, **kw), batch_format="pyarrow"
    )


# ------------------------------------------------ cell join (radius join)
def safe_join_order(radius_deg: float, max_order: int = 18) -> int:
    """Largest HEALPix order whose 3x3 neighbor patch provably covers a
    radius_deg disk: requires radius <= inradius of the most squished pixel.
    We use the conservative bound inradius(order) >= 0.5 * maxpixrad(order)
    (empirically validated in tests/test_joins.py)."""
    r_rad = radius_deg * RAD
    order = 0
    while order < max_order and 0.5 * healpix.max_pix_rad(order + 1) >= r_rad:
        order += 1
    return order


def _patch_cells(order, pix):
    """(N, 9) candidate patch: own pixel + 8 neighbors (-1 padded)."""
    nb = healpix.neighbors(order, pix)
    return np.column_stack([pix, nb])


def radius_join(
    left_ds,
    right_ds,
    radius_deg: float,
    *,
    order: int | None = None,
    left_id="left_id",
    right_id="right_id",
    id_col="doc_id",
    hpx_col="hpx20",
    hpx_level=20,
):
    """Distributed point-point radius join (engine addition per north_rule).

    Plan: probe side (left) is exploded into its 9-cell neighbor patch at
    ``order``; build side (right) keys by its own cell. A co-shuffle
    ``groupby(cell)`` then yields candidates; the exact secant-distance
    predicate dist2 <= 4 sin^2(theta/2) filters. Each qualifying pair is
    produced exactly once (in the build point's own cell), so no dedupe
    shuffle is needed. Only (cell, id, x, y, z) ever enters the shuffle.
    """
    if order is None:
        order = safe_join_order(radius_deg)
    shift = 2 * (hpx_level - order)
    s = math.sin(radius_deg * 0.5 * RAD)
    thresh = 4.0 * s * s

    def explode_left(tbl: pa.Table) -> pa.Table:
        pix = tbl[hpx_col].to_numpy(zero_copy_only=False) >> shift
        patch = _patch_cells(order, pix)  # (N, 9)
        n = len(tbl)
        rep = np.repeat(np.arange(n), 9)
        cells = patch.ravel()
        keep = cells >= 0
        return pa.table(
            {
                "cell": pa.array(cells[keep]),
                "side": pa.array(np.zeros(keep.sum(), dtype=np.int8)),
                "id": pa.array(tbl[id_col].to_numpy(zero_copy_only=False)[rep[keep]]),
                "x": pa.array(tbl["x"].to_numpy(zero_copy_only=False)[rep[keep]]),
                "y": pa.array(tbl["y"].to_numpy(zero_copy_only=False)[rep[keep]]),
                "z": pa.array(tbl["z"].to_numpy(zero_copy_only=False)[rep[keep]]),
            }
        )

    def key_right(tbl: pa.Table) -> pa.Table:
        pix = tbl[hpx_col].to_numpy(zero_copy_only=False) >> shift
        return pa.table(
            {
                "cell": pa.array(pix),
                "side": pa.array(np.ones(len(tbl), dtype=np.int8)),
                "id": tbl[id_col],
                "x": tbl["x"],
                "y": tbl["y"],
                "z": tbl["z"],
            }
        )

    probes = left_ds.map_batches(explode_left, batch_format="pyarrow")
    builds = right_ds.map_batches(key_right, batch_format="pyarrow")
    both = probes.union(builds)

    def join_group(df):
        import pandas as pd

        probe = df[df["side"] == 0]
        build = df[df["side"] == 1]
        if len(probe) == 0 or len(build) == 0:
            return pd.DataFrame({left_id: [], right_id: []}).astype(np.int64)
        pv = probe[["x", "y", "z"]].to_numpy()
        bv = build[["x", "y", "z"]].to_numpy()
        # pairwise squared secant distance, vectorized
        dx = pv[:, 0, None] - bv[None, :, 0]
        dy = pv[:, 1, None] - bv[None, :, 1]
        dz = pv[:, 2, None] - bv[None, :, 2]
        d2 = dx * dx + dy * dy + dz * dz
        ii, jj = np.nonzero(d2 <= thresh)
        return pd.DataFrame(
            {
                left_id: probe["id"].to_numpy()[ii],
                right_id: build["id"].to_numpy()[jj],
            }
        )

    return both.groupby("cell").map_groups(join_group, batch_format="pandas")


# ------------------------------------------------------------------- kNN
def knn(
    ds,
    query_points,
    k: int,
    *,
    id_col="doc_id",
):
    """Distributed brute-force kNN: broadcast the (Q, 3) query matrix; each
    batch computes a Q x B distance block and keeps a per-batch top-k
    (np.argpartition); the driver merges the tiny partials.

    Returns a pyarrow Table (query_id, doc_id-named id_col, rank) with rank
    1..k, ties broken by (dist2, id) ascending — fully deterministic.
    query_points: list of (query_id, lon, lat).
    """
    qids = np.array([q[0] for q in query_points], dtype=np.int64)
    qv = xyz_from_lonlat(
        np.array([q[1] for q in query_points], dtype=np.float64),
        np.array([q[2] for q in query_points], dtype=np.float64),
    )

    def partial_topk(tbl: pa.Table) -> pa.Table:
        xyz = np.column_stack(
            [
                tbl["x"].to_numpy(zero_copy_only=False),
                tbl["y"].to_numpy(zero_copy_only=False),
                tbl["z"].to_numpy(zero_copy_only=False),
            ]
        )
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        # dist2 = 2 - 2 * dot for unit vectors, but compute the explicit
        # difference form to match the SQL oracle bit-for-bit.
        out_q, out_i, out_d = [], [], []
        for qi in range(len(qids)):
            dx = xyz[:, 0] - qv[qi, 0]
            dy = xyz[:, 1] - qv[qi, 1]
            dz = xyz[:, 2] - qv[qi, 2]
            d2 = dx * dx + dy * dy + dz * dz
            kk = min(k, len(d2))
            part = np.argpartition(d2, kk - 1)[:kk] if kk < len(d2) else np.arange(len(d2))
            out_q.append(np.full(kk, qids[qi]))
            out_i.append(ids[part])
            out_d.append(d2[part])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "dist2": pa.array(np.concatenate(out_d)),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    import pandas as pd

    df = pd.DataFrame(partials)
    df = df.sort_values(["query_id", "dist2", id_col], kind="mergesort")
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k][["query_id", id_col, "rank"]].reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# --------------------------------------------------------------- aggregates
def cell_counts(ds, cell_col: str, out_level: int, data_level: int = 20):
    """Per-cell point counts at out_level (tree-node counts analog,
    SURVEY §2.7 A1): derive the coarse cell by shift inside map_batches
    (a partial pre-aggregation), then a small groupby-sum shuffle."""
    shift = 2 * (data_level - out_level)

    def partial(tbl: pa.Table) -> pa.Table:
        cells = tbl[cell_col].to_numpy(zero_copy_only=False) >> shift
        uniq, cnt = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(uniq), "partial_count": pa.array(cnt)})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .sum("partial_count")
    )

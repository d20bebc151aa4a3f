"""Dataset -> Dataset spatial operators (the Ray-Data-native engine core).

Every operator is a composable function over ``ray.data.Dataset`` built from
``map_batches(batch_format="pyarrow", batch_size=None)`` + vectorized NumPy kernels, with
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
from .kernels import hashing, healpix, htm as htmk, s2 as s2k, vec

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
    Engine columns derive from url alone => idempotent partition recompute.

    urls may be an Arrow string column (zero-copy batched SHA-1 over the flat
    buffer, kernels/hashing.py) or any Python sequence of str/bytes."""
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        raw = hashing.sha1_pairs_of_column(urls)
    else:
        raw = hashing.sha1_pairs_of_strings(urls)
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
    s2_leaf: bool = False,
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
        lon, lat = positions_from_url(tbl[url_col])
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
    if s2_leaf:
        # uint64 leaf ids (level 30); coarser S2 cells are id prefixes so
        # any level's range query runs against the one stored column
        cols["s230"] = pa.array(s2k.cellid_from_xyz(v))
    return pa.table(cols)


def encode(ds, **kw):
    """Dataset flavor of encode_batch; stateless, embarrassingly parallel."""
    return ds.map_batches(
        lambda tbl: encode_batch(tbl, **kw), batch_format="pyarrow",
        batch_size=None,
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


def region_search(ds, plan, *, cell_col=None, data_level=20, negate=False):
    """cone_search / polygon_search over an encoded Dataset: broadcast the
    plan, filter each batch (no shuffle). Returns the matching rows.
    plan mode: 0 = HTM, 1 = HEALPix, 2 = S2 (uint64 leaf-range plan)."""
    if cell_col is None:
        cell_col = (
            "s230" if plan["mode"] == 2
            else ("htm" if plan["mode"] == 0 else "hpx") + str(data_level)
        )
    shift = 0 if plan["mode"] == 2 else 2 * (data_level - plan["level"])
    if not negate:
        return ds.map_batches(
            lambda tbl: region_filter_batch(tbl, plan, cell_col, shift),
            batch_format="pyarrow",
            batch_size=None,
        )

    def anti(tbl: pa.Table) -> pa.Table:
        xyz = np.column_stack(
            [
                tbl["x"].to_numpy(zero_copy_only=False),
                tbl["y"].to_numpy(zero_copy_only=False),
                tbl["z"].to_numpy(zero_copy_only=False),
            ]
        )
        return tbl.filter(pa.array(~plan["region"].mask(xyz)))

    return ds.map_batches(anti, batch_format="pyarrow", batch_size=None)


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
        lambda t: tile_assign_batch(t, tile_deg, **kw), batch_format="pyarrow",
        batch_size=None,
    )


def tile_region_search(
    ds,
    tile_id: int,
    tile_deg: float,
    *,
    lon_col="lon",
    lat_col="lat",
    cell_col="hpx20",
    data_level: int = 20,
    plan_level: int = 7,
):
    """RASTER -> VECTOR: recover the rows of one raster tile as a pruned
    region query — the inverse of tile_assign (north_rule's raster<->vector
    pair). A lat-lon tile is NOT a geodesic polygon (its N/S edges are
    small circles), so the index prefilter is a guaranteed-superset CONE
    cover around the tile center: any tile point is within
    |dlat| + |dlon|*cos(lat) <= tile_deg of the center (meridian+parallel
    arc bound), so radius = 1.01*tile_deg covers it at every latitude. The
    exact filter then reapplies tile_assign_batch's floor arithmetic —
    bit-identical semantics, so the tile_assign/tile_region pair is
    loss-free both ways."""
    from .spatial_index import SpatialIndex  # lazy: no import cycle

    nx = int(math.ceil(360.0 / tile_deg))
    ty, tx = divmod(int(tile_id), nx)
    lon_c = (tx + 0.5) * tile_deg
    lat_c = (ty + 0.5) * tile_deg - 90.0
    plan = SpatialIndex().cone_plan(
        lon_c, lat_c, 1.01 * tile_deg, mode=1, level=plan_level
    )
    shift = 2 * (data_level - plan_level)

    def filt(tbl: pa.Table) -> pa.Table:
        cells = tbl[cell_col].to_numpy(zero_copy_only=False) >> shift
        m = ranges_mask(cells, plan["ranges"])
        if not m.any():
            return tbl.slice(0, 0)
        sub = tbl.filter(pa.array(m))
        lon = sub[lon_col].to_numpy(zero_copy_only=False)
        lat = sub[lat_col].to_numpy(zero_copy_only=False)
        tid = (
            np.floor((lat + 90.0) / tile_deg).astype(np.int64) * nx
            + np.floor(lon / tile_deg).astype(np.int64)
        )
        return sub.filter(pa.array(tid == np.int64(tile_id)))

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=None)


def tile_counts(ds, tile_deg: float, lon_col="lon", lat_col="lat"):
    """Per-tile row counts with partial pre-aggregation: each batch shrinks
    to its distinct tiles before the (tiny) groupby-sum shuffle — the same
    combiner shape as cell_counts."""

    def partial(tbl: pa.Table) -> pa.Table:
        t = tile_assign_batch(tbl, tile_deg, lon_col=lon_col, lat_col=lat_col)
        tiles = t["tile_id"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(tiles, return_counts=True)
        return pa.table({"tile_id": pa.array(uniq), "partial": pa.array(cnt)})

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("tile_id")
        .sum("partial")
    )


# -------------------------------------------------------- hash exchange
def hash_exchange_two_level(ds, key_col: str, n_shards: int, shard_fn, n_groups: int | None = None):
    """Two-level hash exchange: M map tasks split into G group pieces
    (contiguous shard ranges), G mid tasks gather their group and re-split
    into S/G shards, reduce tasks consume exactly ONE piece each.

    Scale shape vs the flat exchange: object count M*G + S instead of M*S,
    and reduce fan-in 1 instead of M — the right topology once M*S outgrows
    a few thousand pieces (e.g. 10^4 blocks x 10^3 shards on a cluster).
    Each mid task materializes ~1/G of the data — size G so that fits a
    worker. Single-node benches keep the flat exchange (lower latency)."""
    import ray

    if n_groups is None:
        n_groups = max(1, int(math.isqrt(n_shards)))
    n_groups = min(n_groups, n_shards)
    # shard s belongs to group s * G // S (contiguous ranges)
    bounds = [(g * n_shards) // n_groups for g in range(n_groups + 1)]

    @ray.remote
    def _split_groups(tbl: pa.Table, bnds):
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sorted_tbl = tbl.take(pa.array(order))
        sk = keys[order]
        cuts = np.searchsorted(sk, np.asarray(bnds))
        return tuple(
            sorted_tbl.slice(cuts[g], cuts[g + 1] - cuts[g])
            for g in range(len(bnds) - 1)
        )

    @ray.remote
    def _mid(g_lo, g_hi, *pieces):
        nonempty = [p for p in pieces if len(p)]
        if not nonempty:
            empty = pieces[0]
            return tuple(empty for _ in range(g_hi - g_lo))
        tbl = pa.concat_tables(nonempty)
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sorted_tbl = tbl.take(pa.array(order))
        sk = keys[order]
        cuts = np.searchsorted(sk, np.arange(g_lo, g_hi + 1))
        return tuple(
            sorted_tbl.slice(cuts[i], cuts[i + 1] - cuts[i])
            for i in range(g_hi - g_lo)
        )

    @ray.remote
    def _reduce1(piece):
        return shard_fn(piece)

    block_refs = ds.to_arrow_refs()
    grp_pieces = [
        _split_groups.options(num_returns=n_groups).remote(r, bounds)
        for r in block_refs
    ]
    if n_groups == 1:
        grp_pieces = [[r] for r in grp_pieces]
    out = []
    for g in range(n_groups):
        lo, hi = bounds[g], bounds[g + 1]
        if hi == lo:
            continue
        shards = _mid.options(num_returns=max(hi - lo, 1)).remote(
            lo, hi, *[grp_pieces[m][g] for m in range(len(grp_pieces))]
        )
        if hi - lo == 1:
            shards = [shards]
        out.extend(_reduce1.remote(s) for s in shards)
    import ray as _r

    return _r.data.from_arrow_refs(out)


def hash_exchange(ds, key_col: str, n_shards: int, shard_fn):
    """Deterministic hash-partitioned exchange + per-shard apply, built on
    raw Ray tasks (the documented last-resort: Ray Data's sort-based
    groupby().map_groups() measured 5-6x slower than the sort itself on this
    access pattern, and its hash-shuffle strategy spawns one aggregator
    actor per partition — pathological on few nodes).

    ds rows must carry an integer column ``key_col`` in [0, n_shards).
    shard_fn: pyarrow.Table -> pyarrow.Table, applied once per shard with
    all of that shard's rows. Returns a Dataset of the shard outputs.

    Scale shape: M map tasks x n_shards object-store partitions (zero-copy
    Arrow slices), n_shards reduce tasks; identical to a cluster-wide
    hash shuffle — partition count should be ~2-4x total cores.
    """
    import ray

    @ray.remote
    def _split(tbl: pa.Table, nsh: int):
        # Ray groupby can emit zero-row blocks with an EMPTY schema, which
        # map_batches passes through untagged — route them as empty slices.
        # It also passes zero-row blocks through map_batches WITHOUT format
        # conversion, so a pandas block from an upstream map_groups can
        # arrive here untouched — coerce.
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        if tbl.num_rows == 0 or key_col not in tbl.schema.names:
            empty = tbl.slice(0, 0)
            return tuple(empty for _ in range(nsh))
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sorted_tbl = tbl.take(pa.array(order))
        sk = keys[order]
        bounds = np.searchsorted(sk, np.arange(nsh + 1))
        return tuple(
            sorted_tbl.slice(bounds[s], bounds[s + 1] - bounds[s])
            for s in range(nsh)
        )

    @ray.remote
    def _reduce(*parts):
        # n_shards == 1: Ray does NOT unpack a num_returns=1 task's tuple,
        # so each part arrives as a 1-tuple of Table — unwrap it
        parts = tuple(p[0] if isinstance(p, tuple) else p for p in parts)
        nonempty = [p for p in parts if len(p)]
        if not nonempty:
            # empty shard: hand shard_fn the widest-schema empty slice so
            # it can supply the output schema (schema-less blocks from an
            # upstream groupby carry no columns at all). Among equal-width
            # donors prefer one with NO null-typed columns — from_pandas on
            # a zero-row object column infers Arrow type null, which
            # downstream .to_numpy()/cast kernels mishandle (ADVICE r3).
            return shard_fn(
                max(
                    parts,
                    key=lambda p: (
                        p.num_columns,
                        sum(not pa.types.is_null(f.type) for f in p.schema),
                    ),
                )
            )
        return shard_fn(pa.concat_tables(nonempty))

    # Keep exchange pieces LARGE: Ray inlines objects under ~100 KB through
    # the owner process, so an M-blocks x n_shards exchange of tiny pieces
    # funnels the whole shuffle through the driver (measured: superlinear
    # collapse beyond ~10k pieces). Coalesce input blocks so M x S stays
    # bounded and pieces stay comfortably above the inline threshold.
    block_refs = ds.to_arrow_refs()
    if len(block_refs) * n_shards > 4096:
        m_target = max(8, 4096 // n_shards)
        ds = ray.data.from_arrow_refs(block_refs).repartition(m_target)
        block_refs = ds.to_arrow_refs()
    split_refs = [
        _split.options(num_returns=n_shards).remote(r, n_shards)
        for r in block_refs
    ]
    if n_shards == 1:
        split_refs = [[r] for r in split_refs]
    out = [
        _reduce.remote(*[split_refs[m][s] for m in range(len(split_refs))])
        for s in range(n_shards)
    ]
    return ray.data.from_arrow_refs(out)


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


_SHARD_MIX = np.uint64(0x9E3779B97F4A7C15)

# piece-count budget above which the flat M x S exchange collapses (pieces
# fall under Ray's ~100 KB inline threshold and funnel through the driver —
# measured superlinear; see hash_exchange docstring)
EXCHANGE_PIECE_BUDGET = 4096


def select_exchange(n_blocks: int, n_shards: int) -> str:
    """Exchange-topology selection rule (VERDICT r3 item 7): the flat
    exchange moves M x S pieces; once that exceeds EXCHANGE_PIECE_BUDGET the
    two-level M*G + S topology wins (bounded object count, reduce fan-in 1).
    Below the budget flat stays the default — lower latency, no mid tasks."""
    return "two_level" if n_blocks * n_shards > EXCHANGE_PIECE_BUDGET else "flat"


def radius_join(
    left_ds,
    right_ds,
    radius_deg: float,
    *,
    order: int | None = None,
    n_shards: int = 256,
    coarse_levels: int = 3,
    left_id="left_id",
    right_id="right_id",
    id_col="doc_id",
    hpx_col="hpx20",
    hpx_level=20,
    exchange: str = "auto",
    with_dist2: bool = False,
):
    """Distributed point-point radius join (engine addition per north_rule).

    ``with_dist2=True`` appends the squared secant distance column
    ``dist2`` to each emitted pair (bit-exact float64 ``dx*dx+dy*dy+dz*dz``
    — reproducible in SQL for argmin duals); used by ``crossmatch_best``.

    Correctness plan: candidates are (probe, build) rows where the build
    point's own HEALPix cell at ``order`` lies in the probe's 3x3 neighbor
    patch (partitioning assumption: radius <= the safe_join_order bound);
    the exact secant-distance predicate dist2 <= 4 sin^2(theta/2) filters.

    Scale plan (round 2 — replaces the 9x probe explode of round 1): rows
    are routed by the COARSE cell ``order - coarse_levels``. The build side
    goes to exactly one shard (hash of its own coarse cell); a probe goes to
    each DISTINCT coarse cell covering its 9-cell patch — measured ~1.2-1.6x
    duplication instead of 9x, so the shuffle moves ~6x fewer probe bytes.
    Each probe copy carries its routing coarse cell; in-shard it only
    matches patch cells inside that coarse cell, so every qualifying pair is
    produced exactly once (in the build point's unique shard) even when two
    of a probe's coarse cells hash to the same shard. The in-shard merge is
    a sorted searchsorted range join (pure NumPy — no pandas hash merge).
    Only (coarse, cell, id, x, y, z) enters the shuffle — never payloads.
    """
    if order is None:
        order = safe_join_order(radius_deg)
    coarse_order = max(order - coarse_levels, 0)
    cshift = 2 * (order - coarse_order)
    # shard-count cap: M x S exchange pieces must stay ~4096 and above
    # Ray's ~100 KB inline threshold (see hash_exchange docstring)
    n_shards = min(n_shards, 512)
    shift = 2 * (hpx_level - order)
    s = math.sin(radius_deg * 0.5 * RAD)
    thresh = 4.0 * s * s
    nsh = np.uint64(n_shards)

    def _shard_of(coarse: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((coarse.astype(np.uint64) * _SHARD_MIX) % nsh).astype(np.int64)

    def explode_left(tbl: pa.Table) -> pa.Table:
        pix = tbl[hpx_col].to_numpy(zero_copy_only=False) >> shift
        patch = _patch_cells(order, pix)  # (N, 9), -1 padded
        coarse = np.where(patch >= 0, patch >> cshift, np.int64(-1))
        cs = np.sort(coarse, axis=1)
        keep = cs >= 0
        keep[:, 1:] &= cs[:, 1:] != cs[:, :-1]  # distinct coarse per row
        rep = np.broadcast_to(
            np.arange(len(tbl))[:, None], cs.shape
        ).ravel()[keep.ravel()]
        route = cs.ravel()[keep.ravel()]
        return pa.table(
            {
                "shard": pa.array(_shard_of(route)),
                "coarse": pa.array(route),
                "cell": pa.array(pix[rep]),
                "side": pa.array(np.zeros(len(rep), dtype=np.int8)),
                "id": pa.array(tbl[id_col].to_numpy(zero_copy_only=False)[rep]),
                "x": pa.array(tbl["x"].to_numpy(zero_copy_only=False)[rep]),
                "y": pa.array(tbl["y"].to_numpy(zero_copy_only=False)[rep]),
                "z": pa.array(tbl["z"].to_numpy(zero_copy_only=False)[rep]),
            }
        )

    def key_right(tbl: pa.Table) -> pa.Table:
        pix = tbl[hpx_col].to_numpy(zero_copy_only=False) >> shift
        coarse = pix >> cshift
        return pa.table(
            {
                "shard": pa.array(_shard_of(coarse)),
                "coarse": pa.array(coarse),
                "cell": pa.array(pix),
                "side": pa.array(np.ones(len(tbl), dtype=np.int8)),
                "id": tbl[id_col],
                "x": tbl["x"],
                "y": tbl["y"],
                "z": tbl["z"],
            }
        )

    probes = left_ds.map_batches(explode_left, batch_format="pyarrow", batch_size=None)
    builds = right_ds.map_batches(key_right, batch_format="pyarrow", batch_size=None)
    both = probes.union(builds)

    empty_cols = {
        left_id: pa.array([], type=pa.int64()),
        right_id: pa.array([], type=pa.int64()),
    }
    if with_dist2:
        empty_cols["dist2"] = pa.array([], type=pa.float64())
    empty = pa.table(empty_cols)

    def join_shard(tbl: pa.Table) -> pa.Table:
        side = tbl["side"].to_numpy(zero_copy_only=False)
        is_b = side == 1
        if not is_b.any() or is_b.all():
            return empty
        cell = tbl["cell"].to_numpy(zero_copy_only=False)
        ids = tbl["id"].to_numpy(zero_copy_only=False)
        xs = tbl["x"].to_numpy(zero_copy_only=False)
        ys = tbl["y"].to_numpy(zero_copy_only=False)
        zs = tbl["z"].to_numpy(zero_copy_only=False)
        # build side sorted by fine cell for range lookups
        b_idx = np.flatnonzero(is_b)
        b_order = b_idx[np.argsort(cell[b_idx], kind="stable")]
        bc = cell[b_order]
        p_idx = np.flatnonzero(~is_b)
        p_cell = cell[p_idx]
        p_route = tbl["coarse"].to_numpy(zero_copy_only=False)[p_idx]
        # re-derive each probe copy's patch; keep only cells in its routing
        # coarse cell (pair-uniqueness under shard hash collisions)
        patch = _patch_cells(order, p_cell)  # (P, 9)
        patch = np.where(
            (patch >= 0) & ((patch >> cshift) == p_route[:, None]),
            patch,
            np.int64(-1),
        )
        lo = np.searchsorted(bc, patch, side="left")
        hi = np.searchsorted(bc, patch, side="right")
        cnt = (hi - lo).ravel()
        total = int(cnt.sum())
        if total == 0:
            return empty
        rep_pj = np.repeat(np.arange(patch.size), cnt)  # flat (row, j) index
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
        cand_b = b_order[lo.ravel()[rep_pj] + within]
        cand_p = p_idx[rep_pj // 9]
        dx = xs[cand_p] - xs[cand_b]
        dy = ys[cand_p] - ys[cand_b]
        dz = zs[cand_p] - zs[cand_b]
        d2 = dx * dx + dy * dy + dz * dz
        m = d2 <= thresh
        cols = {
            left_id: pa.array(ids[cand_p[m]]),
            right_id: pa.array(ids[cand_b[m]]),
        }
        if with_dist2:
            cols["dist2"] = pa.array(d2[m])
        return pa.table(cols)

    # ``exchange="two_level"`` routes the same shard stream through the
    # M*G + S piece topology (hash_exchange_two_level) — identical pairs by
    # construction; the right choice once M*S outgrows a few thousand
    # pieces on a cluster. ``"auto"`` (the default) applies select_exchange
    # on the REAL block count (to_arrow_refs executes the upstream map —
    # both topologies do that first anyway, so this costs nothing extra).
    if exchange == "auto":
        import ray as _ray

        refs = both.to_arrow_refs()
        both = _ray.data.from_arrow_refs(refs)
        exchange = select_exchange(len(refs), n_shards)
    if exchange == "two_level":
        return hash_exchange_two_level(both, "shard", n_shards, join_shard)
    return hash_exchange(both, "shard", n_shards, join_shard)


def crossmatch_best(
    left_ds,
    right_ds,
    radius_deg: float,
    *,
    k: int = 1,
    exclude_self: bool = True,
    id_col="doc_id",
    **join_kwargs,
):
    """Best-match crossmatch: for every left point, the k nearest right
    points within ``radius_deg`` (the astronomy-catalog crossmatch the
    reference's cone machinery serves one query at a time; here it runs as
    one distributed pass — reference cone predicate: htm_s2cone
    /root/reference/src/htmCone.c semantics applied per-pair).

    Shape at scale: ``radius_join(with_dist2=True)`` streams candidate
    pairs (coarse-cell-routed, ~1.3x probe duplication, payloads never
    shuffle), then ``topk_reduce(as_dataset=True)`` merges per-left-id
    partials distributedly — per-batch k-truncating combiner, one groupby
    on left_id — so no stage ever materializes the pair stream and the
    driver holds nothing. Output Dataset (left_id, right_id, rank), rank
    1..k by (dist2, right_id) ascending; fully deterministic (float64
    dist2 is bit-exact reproducible in SQL).

    ``exclude_self`` drops the trivial left_id == right_id pair for
    self-crossmatch (same table on both sides)."""
    pairs = radius_join(
        left_ds, right_ds, radius_deg, id_col=id_col, with_dist2=True,
        **join_kwargs,
    )
    if exclude_self:

        def drop_self(tbl: pa.Table) -> pa.Table:
            return tbl.filter(pc.invert(pc.equal(tbl["left_id"], tbl["right_id"])))

        pairs = pairs.map_batches(drop_self, batch_format="pyarrow", batch_size=None)
    return topk_reduce(
        pairs, k, key_col="left_id", id_col="right_id", score_col="dist2",
        ascending=True, as_dataset=True,
    )


# ------------------------------------------------------------------- kNN
def _topk_table(
    tbl: pa.Table,
    k: int,
    key_col: str,
    id_col: str,
    score_col: str,
    ascending: bool,
) -> pa.Table:
    """Keep the best-k rows per key from a (key, id, score) table — one
    vectorized lexsort + group-head rank, no per-row Python. Deterministic:
    ties broken by (score, id) with id always ascending."""
    if len(tbl) == 0:
        return tbl
    keys = tbl[key_col].to_numpy(zero_copy_only=False)
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    scores = tbl[score_col].to_numpy(zero_copy_only=False)
    s = scores if ascending else -scores
    order = np.lexsort((ids, s, keys))
    sk = keys[order]
    # rank within each key run: position minus the run's start offset
    starts = np.nonzero(np.concatenate([[True], sk[1:] != sk[:-1]]))[0]
    run_id = np.cumsum(np.concatenate([[False], sk[1:] != sk[:-1]]))
    rank = np.arange(len(sk)) - starts[run_id]
    return tbl.take(pa.array(order[rank < k]))


def topk_reduce(
    parts_ds,
    k: int,
    *,
    key_col: str,
    id_col: str,
    score_col: str,
    ascending: bool = True,
    fan_in_rows: int = 65536,
    as_dataset: bool = False,
    keep_score: bool = False,
):
    """Distributed merge of per-block top-k partials (the scale-safe
    replacement for ``take_all()`` + a driver pandas sort, VERDICT r2 item
    2): a combiner ``map_batches`` pass re-truncates ``fan_in_rows``-sized
    runs of partial tables, then a per-key ``groupby().map_groups`` computes
    the final top-k and dense 1..k ranks — the driver materializes only the
    final Q*k rows, independent of input block count.

    Returns a pyarrow Table (key_col, id_col, rank) with rank int64.

    ``as_dataset=True`` returns the grouped result as a streaming Dataset
    instead of a driver-materialized table — REQUIRED when the key count is
    data-sized (e.g. ``crossmatch_best``, one key per left row) rather than
    query-sized (kNN, a handful of probe points)."""

    def combine(tbl: pa.Table) -> pa.Table:
        return _topk_table(tbl, k, key_col, id_col, score_col, ascending)

    combined = parts_ds.map_batches(
        combine, batch_format="pyarrow", batch_size=fan_in_rows
    )

    def final(tbl: pa.Table) -> pa.Table:
        top = _topk_table(tbl, k, key_col, id_col, score_col, ascending)
        scores = top[score_col].to_numpy(zero_copy_only=False)
        ids = top[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, scores if ascending else -scores))
        top = top.take(pa.array(order))
        cols = {
            key_col: top[key_col],
            id_col: top[id_col],
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        }
        if keep_score:
            cols[score_col] = top[score_col]
        return pa.table(cols)

    out = combined.groupby(key_col).map_groups(final, batch_format="pyarrow")
    if as_dataset:
        return out
    tables = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table(
            {
                key_col: pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(tables)


def knn(
    ds,
    query_points,
    k: int,
    *,
    id_col="doc_id",
):
    """Distributed brute-force kNN: broadcast the (Q, 3) query matrix; each
    batch computes a Q x B distance block and keeps a per-batch top-k
    (np.argpartition); partials merge DISTRIBUTEDLY via ``topk_reduce``
    (combiner map_batches + per-query groupby), so the driver materializes
    only the final Q*k rows regardless of block count.

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
        # difference form to match the SQL oracle bit-for-bit — the (Q,B,3)
        # broadcast keeps the per-component op order (dx2 + dy2) + dz2
        # identical to the scalar form (VERDICT r3 item 8: this replaced
        # the last per-query Python loop in a headline operator).
        diff = qv[:, None, :] - xyz[None, :, :]  # (Q, B, 3)
        d2 = (diff * diff).sum(axis=2)  # (Q, B)
        kk = min(k, d2.shape[1])
        if kk < d2.shape[1]:
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]  # (Q, kk)
        else:
            part = np.broadcast_to(np.arange(kk), (len(qids), kk))
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids, kk)),
                id_col: pa.array(ids[part.ravel()]),
                "dist2": pa.array(np.take_along_axis(d2, part, axis=1).ravel()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=None)
    return topk_reduce(
        partials, k, key_col="query_id", id_col=id_col, score_col="dist2"
    )


# ------------------------------------------------------- skew / hot cells
_HASH_BASE = np.uint64(1099511628211)


def hash64_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized 64-bit polynomial hash of a string column: O(total bytes)
    segment-wise Horner over the zero-copy Arrow buffer (kernels/hashing.py)
    — no (N, Lmax) padded matrix, so a single long outlier row costs only its
    own bytes. Values unchanged vs the round-1 implementation."""
    return hashing.poly_hash64_of_column(arr, base=_HASH_BASE)


def hot_cells(ds, cell_col: str, out_level: int, threshold: int, data_level: int = 20):
    """Detect cells whose row count exceeds ``threshold`` (dense URL
    clusters). Cheap: partial per-batch counts -> small groupby."""
    counts = cell_counts(ds, cell_col, out_level, data_level)
    tbl = counts.to_pandas()
    col = [c for c in tbl.columns if c.startswith("sum")][0]
    return set(tbl.loc[tbl[col] > threshold, "cell"].astype(int))


def dedup_rows(
    ds,
    *,
    cell_col: str = "hpx20",
    url_col: str = "url",
    n_salt: int = 16,
):
    """Exact row dedup by (cell, url) — the resume-idempotency operator
    (SURVEY §2.9) with explicit hot-cell salting: the shuffle key is
    (cell, salt) where salt = hash(url) % n_salt, so a dense URL cluster
    (many rows, few distinct urls, one cell) splits across n_salt reducers
    while identical urls still co-locate. Join results are independent of
    n_salt. Keeps the first row per (cell, url) by warc_ts then url order.
    """

    n_shards = 64

    def add_salt(tbl: pa.Table) -> pa.Table:
        salt = hash64_strings(tbl[url_col]) % np.uint64(n_salt)
        cells = tbl[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            shard = ((cells * np.uint64(n_salt) + salt) % np.uint64(n_shards)).astype(
                np.int64
            )
        return tbl.append_column("_shard", pa.array(shard))

    def first_per_key(tbl: pa.Table) -> pa.Table:
        """Vectorized first-(cell,url) selection for a whole shard: one
        pandas lexsort by (cell, url, warc_ts), keep group heads."""
        import pandas as pd

        if len(tbl) == 0:
            return tbl.drop(["_shard"])
        df = tbl.to_pandas()
        sort_cols = [cell_col, url_col] + (
            ["warc_ts"] if "warc_ts" in df.columns else []
        )
        df = df.sort_values(sort_cols, kind="mergesort")
        head = ~df.duplicated([cell_col, url_col], keep="first")
        out = df[head].drop(columns=["_shard"])
        return pa.Table.from_pandas(out, preserve_index=False)

    tagged = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None)
    return hash_exchange(tagged, "_shard", n_shards, first_per_key)


# ------------------------------------------------------------- equi-join
def hash_exchange2(ds_a, ds_b, key_col_a, key_col_b, n_shards: int, shard_fn):
    """Two-sided hash exchange: co-partition two datasets by their (integer,
    [0, n_shards)) key columns and apply shard_fn(table_a, table_b) once per
    shard. Same raw-task exchange and large-piece rules as hash_exchange.
    NOTE: callers must key by `key % n_shards` AFTER this clamp — pass the
    already-clamped value (both call sites use <= 512)."""
    import ray

    def _mk_split(key_col):
        @ray.remote
        def _split(tbl: pa.Table, nsh: int):
            # same empty-block passthrough coercion as hash_exchange._split
            if not isinstance(tbl, pa.Table):
                tbl = pa.Table.from_pandas(tbl, preserve_index=False)
            if tbl.num_rows == 0 or key_col not in tbl.schema.names:
                empty = tbl.slice(0, 0)
                return tuple(empty for _ in range(nsh))
            keys = tbl[key_col].to_numpy(zero_copy_only=False)
            order = np.argsort(keys, kind="stable")
            sorted_tbl = tbl.take(pa.array(order))
            sk = keys[order]
            bounds = np.searchsorted(sk, np.arange(nsh + 1))
            return tuple(
                sorted_tbl.slice(bounds[s], bounds[s + 1] - bounds[s])
                for s in range(nsh)
            )

        return _split

    @ray.remote
    def _reduce(n_a, *parts):
        # n_shards == 1: unwrap the 1-tuples a num_returns=1 task returns
        parts = tuple(p[0] if isinstance(p, tuple) else p for p in parts)

        def cat(ps):
            # drop schema-less empties (groupby artifacts); if ALL pieces
            # are schema-less the side is truly empty — keep one so the
            # shard_fn sees a (zero-column) table and can handle it
            good = [p for p in ps if p.num_columns] or list(ps[:1])
            return pa.concat_tables(good)

        return shard_fn(cat(parts[:n_a]), cat(parts[n_a:]))

    def _refs(ds):
        refs = ds.to_arrow_refs()
        if len(refs) * n_shards > 2048:
            m_target = max(8, 2048 // n_shards)
            import ray as _r

            refs = _r.data.from_arrow_refs(refs).repartition(m_target).to_arrow_refs()
        return refs

    refs_a = _refs(ds_a)
    refs_b = _refs(ds_b)
    split_a = _mk_split(key_col_a)
    split_b = _mk_split(key_col_b)
    parts_a = [split_a.options(num_returns=n_shards).remote(r, n_shards) for r in refs_a]
    parts_b = [split_b.options(num_returns=n_shards).remote(r, n_shards) for r in refs_b]
    if n_shards == 1:
        parts_a = [[r] for r in parts_a]
        parts_b = [[r] for r in parts_b]
    out = [
        _reduce.remote(
            len(parts_a),
            *[parts_a[m][s] for m in range(len(parts_a))],
            *[parts_b[m][s] for m in range(len(parts_b))],
        )
        for s in range(n_shards)
    ]
    import ray as _r

    return _r.data.from_arrow_refs(out)


_BCAST_CACHE: dict = {}


def _broadcast_side(ref):
    """Worker-process cache: one object-store fetch + pandas conversion per
    worker, however many batches it processes."""
    import ray

    key = ref.hex()
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref).to_pandas()
        _BCAST_CACHE.clear()  # hold at most one broadcast table per worker
        _BCAST_CACHE[key] = hit
    return hit


def equi_join(
    left_ds,
    right_ds,
    on: str,
    *,
    right_on: str | None = None,
    how: str = "inner",
    n_shards: int = 64,
    broadcast: str | None = None,
    hot_keys=None,
    n_salt: int = 8,
):
    """General distributed equi-join (``how``: inner/left/right/outer/
    semi/anti; ``on``/``right_on`` may be a COLUMN LIST for composite-key
    joins on the inner/left/right/outer plans; null-keyed rows follow
    pandas merge semantics — they never match each other). Two plans:

    - ``broadcast="right"`` (or "left"): the small side is materialized ONCE
      into the object store (``ray.put``) and every map task joins its batch
      against the worker-cached copy — a map-side hash join, no exchange at
      all. The right plan whenever one side fits in a worker's heap
      (dimension tables, manifests, query sets).
    - default: two-sided hash exchange (bounded shard key + one vectorized
      pandas merge per shard). Used e.g. to re-attach wide payload columns
      (text/html) to join results by id after a narrow-column shuffle.

    Skew (``hot_keys``): a celebrity key routes ALL its rows to one shard in
    a plain hash exchange. Pass the (small) list of hot key values — e.g.
    from the top of a sampled frequency count — and the exchange salts them:
    hot LEFT rows spread over ``n_salt`` sub-shards (any assignment is
    result-identical, so a cheap cyclic one is used) while hot RIGHT rows
    REPLICATE to all ``n_salt`` sub-shards. ``hot_keys="auto"`` detects them
    with a sampled frequency pass over the left key column
    (``detect_hot_keys``). Shard space is partitioned as
    (bucket * n_salt + salt) so salted copies can never collide into one
    shard and duplicate the join output. Inner/left joins only (semi/anti
    never need it: their right side reduces to distinct keys)."""
    right_on = right_on or on
    n_shards = min(n_shards, 512)
    if not isinstance(on, str):
        # COMPOSITE key join: the exchange tagger chains the column hashes
        # (_shard_tagger) and pandas merges on the list. Semi/anti and
        # salted plans reduce/replicate by a SINGLE key value — derive a
        # concatenated key column first if you need them.
        if how in ("semi", "anti") or hot_keys is not None:
            raise NotImplementedError(
                "composite-key semi/anti/salted joins: derive a single "
                "concatenated key column first"
            )
    if isinstance(hot_keys, str) and hot_keys == "auto":
        # one extra (cheap, key-column-only) pass over the left side; falls
        # back to the plain exchange when no key clears the threshold
        hot_keys = detect_hot_keys(left_ds, on) or None
    if hot_keys is not None and how in ("inner", "left"):
        return _salted_join(
            left_ds, right_ds, on, right_on, how, n_shards,
            list(hot_keys), n_salt,
        )

    if how in ("semi", "anti"):
        return _filter_join(
            left_ds, right_ds, on, right_on, how, n_shards, broadcast
        )

    if broadcast in ("left", "right"):
        if how == "outer" or how == broadcast:
            # any merge that keeps unmatched BROADCAST-side rows would
            # re-emit them once PER BATCH; only the exchange plan (which
            # sees each key's rows in exactly one shard) emits them once.
            # Valid: inner with either side; left with broadcast="right";
            # right with broadcast="left".
            raise ValueError(
                f"how={how!r} keeps unmatched {broadcast} rows: use the "
                "exchange plan (broadcast=None) or broadcast the other side"
            )
        import ray

        small_ds, big_ds = (
            (left_ds, right_ds) if broadcast == "left" else (right_ds, left_ds)
        )
        blocks = ray.get(small_ds.to_arrow_refs())
        # upstream groupbys can emit zero-row EMPTY-SCHEMA blocks that poison
        # the concat — keep real blocks, else the widest empty for the schema
        good = [b for b in blocks if b.num_rows > 0]
        if not good:
            good = [max(blocks, key=lambda b: b.num_columns)]
        small_tbl = pa.concat_tables(good)
        ref = ray.put(small_tbl)

        def join_batch(tbl: pa.Table) -> pa.Table:
            small = _broadcast_side(ref)
            df = tbl.to_pandas()
            if broadcast == "right":
                merged = df.merge(
                    small, left_on=on, right_on=right_on, how=how,
                    suffixes=("", "_r"),
                )
            else:
                merged = small.merge(
                    df, left_on=on, right_on=right_on, how=how,
                    suffixes=("", "_r"),
                )
            return pa.Table.from_pandas(merged, preserve_index=False)

        return big_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)

    def join_shard(ta: pa.Table, tb: pa.Table) -> pa.Table:
        return _merge_shard(ta, tb, on, right_on, how)

    left = left_ds.map_batches(_shard_tagger(on, n_shards), batch_format="pyarrow", batch_size=None)
    right = right_ds.map_batches(_shard_tagger(right_on, n_shards), batch_format="pyarrow", batch_size=None)
    return hash_exchange2(left, right, "_shard", "_shard", n_shards, join_shard)


def _drop_shard(t: pa.Table) -> pa.Table:
    """Strip the exchange's ``_shard`` tag; tolerate a schema-less empty
    block (Ray groupby artifact) that never got tagged."""
    return t.drop(["_shard"]) if "_shard" in t.schema.names else t


def _merge_shard(ta: pa.Table, tb: pa.Table, on, right_on, how) -> pa.Table:
    """One shard's pandas hash merge, schema-safe: a side whose EVERY
    upstream piece was a zero-row EMPTY-SCHEMA block (Ray groupby artifact)
    arrives with no columns at all — pandas merge would raise KeyError on
    the key. Inner/semi with a truly-empty side emits nothing; a left/outer
    join with a schema-less RIGHT returns the left rows unchanged (no right
    column exists anywhere to null-fill — every shard sees the same, so the
    output schema stays consistent), and symmetrically for right/outer."""
    lt, rt = _drop_shard(ta), _drop_shard(tb)
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    l_ok = all(k in lt.schema.names for k in lkeys)
    r_ok = all(k in rt.schema.names for k in rkeys)
    if not l_ok or not r_ok:
        if not l_ok and how in ("right", "outer") and r_ok:
            return rt
        if not r_ok and how in ("left", "outer") and l_ok:
            return lt
        return pa.table({})
    merged = lt.to_pandas().merge(
        rt.to_pandas(), left_on=on, right_on=right_on, how=how,
        suffixes=("", "_r"),
    )
    return pa.Table.from_pandas(merged, preserve_index=False)


def _shard_tagger(key_name: str, n_shards: int):
    """map_batches fn appending a bounded ``_shard`` key: int keys by
    modulo (sign-safe), string keys by hash64. Shared by every keyed
    exchange plan (equi/semi/anti/as-of) so the hashing rule can never
    diverge between them. Branches on the ARROW type (not the numpy dtype):
    a nullable int column materializes as float64-with-NaN and must still
    route through the integer rule — nulls co-locate in shard 0 and are
    dropped by the join masks (null keys never match)."""
    import pyarrow.compute as pc

    names = [key_name] if isinstance(key_name, str) else list(key_name)

    def one_key_shard(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_integer(col.type):
            if col.null_count:
                col = pc.fill_null(col, 0)
            knum = col.to_numpy(zero_copy_only=False)
            return (knum.astype(np.int64) % np.int64(n_shards) + n_shards) % n_shards
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            return (hash64_strings(col) % np.uint64(n_shards)).astype(np.int64)
        raise TypeError(
            f"unsupported exchange key type {col.type}: "
            "use an integer or string key column"
        )

    def f(tbl: pa.Table) -> pa.Table:
        if len(names) == 1:
            shard = one_key_shard(tbl[names[0]])
        else:
            # COMPOSITE key: chain the per-column int identities through
            # splitmix64 so equal tuples land in equal shards on both sides
            acc = np.zeros(len(tbl), dtype=np.int64)
            for nm in names:
                with np.errstate(over="ignore"):
                    acc = _splitmix64(acc ^ _key_ints(tbl[nm])).view(np.int64)
            shard = ((acc % np.int64(n_shards)) + n_shards) % n_shards
        return tbl.append_column("_shard", pa.array(shard))

    return f


def _filter_join(left_ds, right_ds, on, right_on, how, n_shards, broadcast):
    """Semi/anti equi-join: keep left rows with (semi) / without (anti) a key
    match on the right. Only the right side's DISTINCT KEYS matter, so the
    broadcast plan first reduces the right side to its per-batch distinct
    keys and ships that one small array (``ray.put``) — never the full right
    table. The exchange plan shuffles (key-tagged) both sides and masks per
    shard. Null keys never match (SQL EXISTS semantics over non-null keys)."""
    import pyarrow.compute as pc

    if broadcast == "left":
        raise ValueError("semi/anti joins filter the LEFT side; use broadcast='right' or None")

    if broadcast == "bloom":
        # Bloom-prefiltered semi-join (scale path): a compact fixed-size
        # bitmap over the right keys drops definitely-non-matching left
        # rows BEFORE the exchange; survivors verify exactly in the
        # standard exchange plan below, so the RESULT is exact — the bloom
        # only bounds what shuffles. The right choice when the right key
        # set is too large to broadcast as an array but the left side is
        # dominated by non-matching rows (point-lookup joins at 100 TB).
        if how != "semi":
            raise ValueError(
                "broadcast='bloom' prefilters matches and applies to semi "
                "joins only (anti needs every non-match verified anyway)"
            )
        import ray

        bref = ray.put(build_bloom_filter(right_ds, right_on))

        def prefilter(tbl: pa.Table) -> pa.Table:
            keep = bloom_may_contain(ray.get(bref), _key_ints(tbl[on]))
            return tbl.filter(pa.array(keep))

        left_ds = left_ds.map_batches(
            prefilter, batch_format="pyarrow", batch_size=None
        )
        broadcast = None  # fall through to the exact exchange plan

    if broadcast == "right":
        import ray

        def batch_keys(tbl: pa.Table) -> pa.Table:
            return pa.table({right_on: tbl[right_on].unique()})

        key_parts = ray.get(
            right_ds.map_batches(
                batch_keys, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        # drop nulls from the value set: pc.is_in treats a null IN the set as
        # matching null probes, which would leak null-keyed left rows through
        # the semi filter (ADVICE r2) — EXISTS semantics never match nulls
        keys = pc.drop_null(
            pa.concat_tables(key_parts)[right_on].combine_chunks().unique()
        )
        ref = ray.put(keys)

        def filter_batch(tbl: pa.Table) -> pa.Table:
            ks = ray.get(ref)  # zero-copy Arrow array from the object store
            mask = pc.is_in(tbl[on], value_set=ks)
            if how == "anti":
                mask = pc.invert(mask)
            return tbl.filter(pc.fill_null(mask, False))

        return left_ds.map_batches(filter_batch, batch_format="pyarrow", batch_size=None)

    def filter_shard(ta: pa.Table, tb: pa.Table) -> pa.Table:
        left = _drop_shard(ta)
        if on not in left.schema.names or right_on not in tb.schema.names:
            return left if how == "anti" else left.slice(0, 0)
        mask = pc.is_in(
            left[on],
            value_set=pc.drop_null(tb[right_on].combine_chunks().unique()),
        )
        if how == "anti":
            mask = pc.invert(mask)
        return left.filter(pc.fill_null(mask, False))

    left = left_ds.map_batches(_shard_tagger(on, n_shards), batch_format="pyarrow", batch_size=None)
    right = right_ds.map_batches(_shard_tagger(right_on, n_shards), batch_format="pyarrow", batch_size=None)
    return hash_exchange2(left, right, "_shard", "_shard", n_shards, filter_shard)


def detect_hot_keys(ds, col: str, *, frac_threshold: float = 0.05, max_keys: int = 64):
    """Sampled hot-key detection for skew salting: per-batch value counts
    (locally pre-filtered to keys above half the global threshold — a
    combiner, so only candidate keys travel) merged in one small
    groupby-sum shuffle; the driver sees at most ``max_keys`` rows. Keys
    holding >= ``frac_threshold`` of all rows are returned, heaviest first.
    Approximate by design: a key that clears the global threshold while
    sitting below half of it in some batches can be undercounted — celebrity
    keys (the ones that break an exchange) are hot almost everywhere, which
    is exactly when this detector is reliable."""

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        if len(tbl) == 0:
            return pa.table(
                {col: tbl[col], "_n": pa.array([], type=pa.int64()),
                 "_is_key": pa.array([], type=pa.bool_())}
            )
        k = pd.Series(tbl[col].to_numpy(zero_copy_only=False))
        vc = k.value_counts()
        vc = vc[vc >= max(1.0, frac_threshold * len(k) / 2.0)]
        keys = vc.index.to_numpy()
        # one sentinel row per batch (_is_key=False) carries the batch length
        # so the driver can recover the exact global row total
        return pa.table(
            {
                col: pa.array(np.concatenate([keys, k.iloc[:1].to_numpy()])),
                "_n": pa.array(
                    np.concatenate([vc.to_numpy(), [len(k)]]).astype(np.int64)
                ),
                "_is_key": pa.array([True] * len(keys) + [False]),
            }
        )

    # Distributed combine (VERDICT r2 item 3): the k-bounded partials merge
    # through one groupby-sum shuffle + sort/limit, so the driver sees at
    # most max_keys candidate rows + one scalar — O(k), not O(batches*k).
    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).materialize()

    def _split(want_keys: bool):
        def f(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = tbl["_is_key"] if want_keys else pc.invert(tbl["_is_key"])
            return tbl.filter(mask).drop(["_is_key"])

        return f

    total_row = parts.map_batches(
        _split(False), batch_format="pyarrow", batch_size=None
    ).sum("_n")
    total = int(total_row or 0)
    if total == 0:
        return []
    cand = (
        parts.map_batches(_split(True), batch_format="pyarrow", batch_size=None)
        .groupby(col)
        .sum("_n")
        .sort(["sum(_n)", col], descending=[True, False])
        .limit(max_keys)
        .to_pandas()
    )
    if cand.empty:
        return []
    hot = cand[cand["sum(_n)"] >= frac_threshold * total]
    return hot[col].tolist()


def _salted_join(left_ds, right_ds, on, right_on, how, n_shards, hot_keys, n_salt):
    """Skew-aware exchange join (see equi_join docstring). Shard space is
    ``bucket * n_salt + salt``; cold keys derive both bucket and salt from one
    avalanche hash (both sides agree, so cold traffic is an ordinary hash
    exchange at the same total fan-out), hot LEFT rows take a cyclic salt and
    hot RIGHT rows are replicated across all salts of their bucket."""
    import pyarrow.compute as pc

    n_salt = max(2, int(n_salt))
    n_buckets = max(1, n_shards // n_salt)
    total = n_buckets * n_salt
    hot_list = list(hot_keys)

    def _parts(col):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        knum = arr.to_numpy(zero_copy_only=False)
        if knum.dtype.kind in "iu":
            h = _splitmix64(knum.astype(np.int64))
        else:
            h = _splitmix64(hash64_strings(arr).astype(np.int64))
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        salt = ((h >> np.uint64(32)) % np.uint64(n_salt)).astype(np.int64)
        hot_mask = pc.fill_null(
            pc.is_in(arr, value_set=pa.array(hot_list).cast(arr.type)), False
        ).to_numpy(zero_copy_only=False).astype(bool)
        return bucket, salt, hot_mask

    def tag_left(tbl: pa.Table) -> pa.Table:
        bucket, salt, hot = _parts(tbl[on])
        idx = np.flatnonzero(hot)
        if idx.size:
            salt[idx] = np.arange(idx.size, dtype=np.int64) % n_salt
        return tbl.append_column("_shard", pa.array(bucket * n_salt + salt))

    def tag_right(tbl: pa.Table) -> pa.Table:
        bucket, salt, hot = _parts(tbl[right_on])
        shard = bucket * n_salt + salt
        idx = np.flatnonzero(hot)
        if idx.size == 0:
            return tbl.append_column("_shard", pa.array(shard))
        cold = np.flatnonzero(~hot)
        take_idx = np.concatenate([cold, np.repeat(idx, n_salt)])
        rep_shard = (
            np.repeat(bucket[idx], n_salt) * n_salt
            + np.tile(np.arange(n_salt, dtype=np.int64), idx.size)
        )
        out = tbl.take(pa.array(take_idx))
        return out.append_column(
            "_shard", pa.array(np.concatenate([shard[cold], rep_shard]))
        )

    def join_shard(ta: pa.Table, tb: pa.Table) -> pa.Table:
        return _merge_shard(ta, tb, on, right_on, how)

    left = left_ds.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    right = right_ds.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    return hash_exchange2(left, right, "_shard", "_shard", total, join_shard)


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str,
    on: str,
    right_by: str | None = None,
    right_on: str | None = None,
    n_shards: int = 64,
    direction: str = "backward",
    tiebreak: str | None = None,
):
    """Distributed as-of join: for each left row, attach the single right row
    of the same ``by`` key whose ``on`` time is the latest <= the left time
    (``direction='backward'``; 'forward' = earliest >=). An operator the
    reference lacks but streaming/event pipelines need constantly.

    Plan: both sides hash-exchange on the ``by`` key only (narrow columns),
    then one vectorized ``pandas.merge_asof`` per shard. Among equal right
    timestamps merge_asof keeps the LAST row for ``backward`` and the FIRST
    for ``forward`` — pass ``tiebreak`` (a right column name) to make the
    winner deterministic: the right side is pre-sorted so the MAX-tiebreak
    row is chosen for both directions.

    Partitioning assumption: one key's rows fit in one shard's memory (same
    bound as every keyed groupby here); skewed keys would need the salting
    pattern from dedup_rows."""
    right_by = right_by or by
    right_on = right_on or on
    n_shards = min(n_shards, 512)

    def join_shard(ta: pa.Table, tb: pa.Table) -> pa.Table:
        import pandas as pd

        ldf = _drop_shard(ta).to_pandas()
        rdf = _drop_shard(tb).to_pandas()
        ldf = ldf.sort_values(on, kind="mergesort")
        if tiebreak:
            # merge_asof keeps the last equal-time row (backward) / first
            # (forward); sort the tiebreak so that row is the max either way
            asc = [True, direction != "forward"]
            rdf = rdf.sort_values([right_on, tiebreak], ascending=asc,
                                  kind="mergesort")
        else:
            rdf = rdf.sort_values(right_on, kind="mergesort")
        merged = pd.merge_asof(
            ldf,
            rdf,
            left_on=on,
            right_on=right_on,
            left_by=by,
            right_by=right_by,
            direction=direction,
            suffixes=("", "_r"),
        )
        return pa.Table.from_pandas(merged, preserve_index=False)

    left = left_ds.map_batches(_shard_tagger(by, n_shards), batch_format="pyarrow", batch_size=None)
    right = right_ds.map_batches(_shard_tagger(right_by, n_shards), batch_format="pyarrow", batch_size=None)
    return hash_exchange2(left, right, "_shard", "_shard", n_shards, join_shard)


def attach_columns(
    result_ds,
    source_ds,
    on: str,
    columns: list,
    n_shards: int = 64,
    broadcast: str | None = None,
):
    """Re-attach wide columns (e.g. text/html) from the source table to a
    narrow result by key — the pattern that keeps payload bytes out of the
    heavy shuffles (SURVEY §4.2). Pass broadcast="left" when the RESULT side
    is small (e.g. a query hit list): the source is then streamed through a
    map-side join with no exchange at all."""
    src = source_ds.map_batches(
        lambda t: t.select([on] + columns), batch_format="pyarrow", batch_size=None
    )
    return equi_join(result_ds, src, on, n_shards=n_shards, broadcast=broadcast)


# --------------------------------------------------------------- aggregates
def group_quantiles(ds, key_col: str, val_col: str, qs: tuple):
    """EXACT per-group quantiles (discrete: the element at 1-based rank
    ceil(q*n), DuckDB ``quantile_disc`` convention), computed scalably:

    1. per-batch (key, value) partial counts — compresses the stream to the
       value-distribution size (quantized metrics grow sublinearly),
    2. one groupby-sum shuffle of (key, value, count),
    3. per-key weighted selection over the tiny compressed distribution
       (sorted cumsum + searchsorted).

    No full sort, no per-group row materialization — the only all-to-all
    carries the compressed distribution. For continuous never-repeating
    values this degrades to the raw size; cap with pre-rounding if needed."""

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                key_col: tbl[key_col].to_numpy(zero_copy_only=False),
                val_col: tbl[val_col].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([key_col, val_col], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "partial_n"}), preserve_index=False
        )

    dist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby([key_col, val_col])
        .sum("partial_n")
    )

    def quant(df):
        import pandas as pd

        df = df.sort_values(val_col, kind="mergesort")
        cnt = df["sum(partial_n)"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        total = int(cum[-1])
        vals = df[val_col].to_numpy()
        out = {key_col: [df[key_col].iloc[0]], "n_events": [total]}
        for q in qs:
            rank = int(np.ceil(np.float64(q) * np.float64(total)))  # 1-based
            idx = int(np.searchsorted(cum, rank, side="left"))
            out[f"q{int(q * 100)}"] = [vals[idx]]
        return pd.DataFrame(out)

    return dist.groupby(key_col).map_groups(quant, batch_format="pandas")


def group_quantiles_sketch(ds, key_col: str, val_col: str, qs: tuple, n_bins: int = 256):
    """APPROXIMATE per-group quantiles with a bounded-error mergeable
    histogram — the scale path where ``group_quantiles``' exact compressed
    distribution degenerates (continuous never-repeating values: the exact
    plan's shuffle carries one row per distinct value; this one carries at
    most ``n_bins`` rows per group regardless of data size).

    1. per-group [min, max] (per-batch partials + a tiny groupby), broadcast
       once via ``ray.put`` (#groups == output size, assumed driver-sized —
       the same assumption the exact operator's output already makes),
    2. per-batch histogram counts on the group's fixed bin grid — mergeable
       by plain addition, one (key, bin) groupby-sum shuffle,
    3. per-key rank walk over the cumulative histogram; the reported value
       is the owning bin's midpoint, so
       ``|estimate - exact_quantile| <= (max-min)/n_bins / 2`` per group.
    """
    import ray
    from ray.data.aggregate import Max, Min

    def mm_partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                key_col: tbl[key_col].to_numpy(zero_copy_only=False),
                val_col: tbl[val_col].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(key_col)[val_col].agg(["min", "max"]).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ranges = (
        ds.map_batches(mm_partial, batch_format="pyarrow", batch_size=None)
        .groupby(key_col)
        .aggregate(Min("min"), Max("max"))
        .to_pandas()
    )
    keys = ranges[key_col].to_numpy()
    lo = ranges["min(min)"].to_numpy(dtype=np.float64)
    width = (ranges["max(max)"].to_numpy(dtype=np.float64) - lo) / float(n_bins)
    # group lookup by searchsorted over the sorted key array (round 3 —
    # replaces the per-row dict .map): string keys go through numpy's fixed-
    # width U dtype so comparisons stay C-level.
    str_keys = keys.dtype == object
    skeys = keys.astype(str) if str_keys else keys
    korder = np.argsort(skeys, kind="stable")
    ref = ray.put((skeys[korder], lo[korder], width[korder], str_keys))

    def hist_partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        sk, los, ws, as_str = ray.get(ref)
        kraw = tbl[key_col].to_numpy(zero_copy_only=False)
        k = pd.Series(kraw)
        gi = np.searchsorted(sk, kraw.astype(str) if as_str else kraw)
        v = tbl[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = ws[gi]
        b = np.zeros(len(v), dtype=np.int64)
        nz = w > 0
        b[nz] = np.clip(
            ((v[nz] - los[gi[nz]]) / w[nz]).astype(np.int64), 0, n_bins - 1
        )
        g = (
            pd.DataFrame({key_col: k, "_bin": b})
            .groupby([key_col, "_bin"], as_index=False)
            .size()
        )
        return pa.Table.from_pandas(
            g.rename(columns={"size": "partial_n"}), preserve_index=False
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", batch_size=None)
        .groupby([key_col, "_bin"])
        .sum("partial_n")
    )
    kmap = dict(zip(keys.tolist(), range(len(keys))))

    def quant(df):
        import pandas as pd

        df = df.sort_values("_bin", kind="mergesort")
        cnt = df["sum(partial_n)"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        total = int(cum[-1])
        key = df[key_col].iloc[0]
        gi = kmap[key]
        bins = df["_bin"].to_numpy(dtype=np.int64)
        out = {key_col: [key], "n_events": [total]}
        for q in qs:
            rank = int(np.ceil(np.float64(q) * np.float64(total)))
            b = int(bins[int(np.searchsorted(cum, rank, side="left"))])
            est = lo[gi] + (b + 0.5) * width[gi] if width[gi] > 0 else lo[gi]
            out[f"q{int(q * 100)}"] = [float(est)]
        return pd.DataFrame(out)

    return hist.groupby(key_col).map_groups(quant, batch_format="pandas")


def heavy_hitters(ds, key_col: str, k: int = 64):
    """Misra-Gries heavy-hitters sketch: per-batch summaries of at most
    ``k`` counters (exact per-batch counts truncated MG-style: keep the top
    k keys and subtract the (k+1)-th count from each — the classic bound),
    merged by counter addition in ONE small groupby-sum shuffle (k rows per
    batch enter it) + a sort/limit; the driver materializes only the top
    k+1 merged counters — O(k) at any scale.

    Guarantees (standard MG): every key with true count > n/(k+1) is
    present, and each reported count underestimates the true count by at
    most n/(k+1). Returns a pyarrow Table (key, count_lo, n_total) sorted
    by count_lo descending — `count_lo` is the certified lower bound."""

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        if len(tbl) == 0:
            return pa.table(
                {key_col: tbl[key_col], "_n": pa.array([], type=pa.int64()),
                 "_is_key": pa.array([], type=pa.bool_())}
            )
        s = pd.Series(tbl[key_col].to_numpy(zero_copy_only=False))
        vc = s.value_counts()  # descending
        if len(vc) > k:
            dec = int(vc.iloc[k])  # (k+1)-th largest count
            vc = vc.iloc[:k] - dec
            vc = vc[vc > 0]
        keys = vc.index.to_numpy()
        # sentinel row (_is_key=False) carries the batch length for n_total
        return pa.table(
            {
                key_col: pa.array(np.concatenate([keys, s.iloc[:1].to_numpy()])),
                "_n": pa.array(
                    np.concatenate([vc.to_numpy(), [len(s)]]).astype(np.int64)
                ),
                "_is_key": pa.array([True] * len(keys) + [False]),
            }
        )

    import pandas as pd

    # Distributed combine (VERDICT r2 item 3): counters are mergeable by
    # addition, so one groupby-sum shuffle collapses the per-batch partials;
    # only the top k+1 merged counters (enough to compute the MG decrement)
    # ever reach the driver — O(k) independent of batch count.
    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).materialize()

    def _split(want_keys: bool):
        def f(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = tbl["_is_key"] if want_keys else pc.invert(tbl["_is_key"])
            return tbl.filter(mask).drop(["_is_key"])

        return f

    total_row = parts.map_batches(
        _split(False), batch_format="pyarrow", batch_size=None
    ).sum("_n")
    n_total = int(total_row or 0)
    merged_df = (
        parts.map_batches(_split(True), batch_format="pyarrow", batch_size=None)
        .groupby(key_col)
        .sum("_n")
        .sort(["sum(_n)", key_col], descending=[True, False])
        .limit(k + 1)
        .to_pandas()
    )
    if n_total == 0 or merged_df.empty:
        return pa.table({key_col: pa.array([]), "count_lo": pa.array([], type=pa.int64()),
                         "n_total": pa.array([], type=pa.int64())})
    merged = pd.Series(
        merged_df["sum(_n)"].to_numpy(), index=merged_df[key_col].to_numpy()
    )
    if len(merged) > k:
        dec = int(merged.iloc[k])
        merged = merged.iloc[:k] - dec
        merged = merged[merged > 0]
    out = pd.DataFrame(
        {key_col: merged.index.to_numpy(),
         "count_lo": merged.to_numpy().astype(np.int64),
         "n_total": np.full(len(merged), n_total, dtype=np.int64)}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def prefix_sum(ds, order_col: str, value_col: str, n_shards: int = 64,
               lo: int | None = None, hi: int | None = None):
    """Distributed EXCLUSIVE prefix sum of ``value_col`` in ``order_col``
    order — the classic two-pass scan:

    1. range-partition rows into contiguous ``order_col`` shards
       ([lo, hi) from parquet-style bounds or a cheap min/max aggregate),
    2. pass 1: per-shard totals (tiny driver-side prefix over n_shards
       numbers),
    3. pass 2: per-shard vectorized cumsum + broadcast base offset.

    Appends a ``prefix`` column (sum of all values strictly before the row).
    The only all-to-all is the range exchange; everything else is O(rows)
    local work. Scale assumption: order_col roughly uniform over [lo, hi)
    (same contract as build_index_ranged's sampled boundaries)."""
    import ray

    # the scan reads its input up to three times (min/max bounds, pass-1
    # totals, pass-2 exchange); pin the blocks once so a lazy upstream
    # pipeline (often a full groupby) never re-executes per pass
    ds = ds.materialize()
    if lo is None or hi is None:
        mm = ds.aggregate(
            ray.data.aggregate.Min(order_col), ray.data.aggregate.Max(order_col)
        )
        lo = int(mm[f"min({order_col})"])
        hi = int(mm[f"max({order_col})"]) + 1
    span = max(hi - lo, 1)

    width = (span + n_shards - 1) // n_shards  # divide-first: no int64
    # overflow however large the key span (hash-ordered scans span 2^63)

    def tag(tbl: pa.Table) -> pa.Table:
        keys = tbl[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = np.clip((keys - lo) // width, 0, n_shards - 1)
        return tbl.append_column("_shard", pa.array(shard))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)

    # pass 1: per-shard value totals (pre-aggregated inside map_batches)
    def totals(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "_shard": tbl["_shard"].to_numpy(zero_copy_only=False),
                "v": tbl[value_col].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("_shard", as_index=False)["v"].sum()
        return pa.Table.from_pandas(g.rename(columns={"v": "t"}), preserve_index=False)

    tot = (
        tagged.map_batches(totals, batch_format="pyarrow", batch_size=None)
        .groupby("_shard")
        .sum("t")
        .to_pandas()
    )
    base = np.zeros(n_shards, dtype=np.int64)
    for _, row in tot.iterrows():
        base[int(row["_shard"])] = int(row["sum(t)"])
    base = np.concatenate([[0], np.cumsum(base)[:-1]])  # exclusive shard bases

    # pass 2: in-shard sort + cumsum + base offset
    def scan_shard(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.drop(["_shard"]).append_column("prefix", pa.array([], pa.int64()))
        sh = int(tbl["_shard"][0].as_py())
        keys = tbl[order_col].to_numpy(zero_copy_only=False)
        vals = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        cs = np.zeros(len(vals), dtype=np.int64)
        cs[1:] = np.cumsum(vals[order])[:-1]
        prefix = np.empty(len(vals), dtype=np.int64)
        prefix[order] = cs + base[sh]
        return tbl.drop(["_shard"]).append_column("prefix", pa.array(prefix))

    return hash_exchange(tagged, "_shard", n_shards, scan_shard)


_HLL_B = 12  # 4096 registers -> ~1.6% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 avalanche (public-domain constants) — turns
    structured int64 keys into uniform uint64 hashes for sketching."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_registers(ds, group_col: str, key_col: str, b: int = _HLL_B):
    """The HyperLogLog REGISTER STATE per group — (group, reg, max_rho) —
    exposed as its own operator because the registers are exact integers:
    a SQL dual can recompute them bit-for-bit (splitmix64 + leading-zero
    count), making the sketch itself oracle-verifiable even though the
    cardinality ESTIMATE derived from it is approximate. Same partial +
    groupby-max shuffle as hll_distinct, bounded by groups x 2^b rows."""
    regs = _hll_partial_registers(ds, group_col, key_col, b)

    def rename(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or tbl.num_columns != 3:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "reg": pa.array([], pa.int64()),
                    "max_rho": pa.array([], pa.int64()),
                }
            )
        return tbl.rename_columns([group_col, "reg", "max_rho"])

    return regs.map_batches(rename, batch_format="pyarrow", batch_size=None)


def _hll_partial_registers(ds, group_col: str, key_col: str, b: int):

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype.kind in "iu":
            h = _splitmix64(keys.astype(np.int64))
        else:
            # string keys: 64-bit content hash feeds the avalanche directly
            h = _splitmix64(hash64_strings(tbl[key_col]).view(np.int64))
        reg = (h >> np.uint64(64 - b)).astype(np.int64)
        rest = (h << np.uint64(b)) | np.uint64((1 << b) - 1)  # sentinel low bits
        # rho = leading zeros of the remaining 64-b bits + 1
        lz = np.zeros(len(h), dtype=np.int64)
        cur = rest
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz += np.where(mask, shift, 0)
            cur = np.where(mask, cur << np.uint64(shift), cur)
        rho = np.minimum(lz, 64 - b) + 1
        df = pd.DataFrame(
            {
                group_col: tbl[group_col].to_numpy(zero_copy_only=False),
                "reg": reg,
                "rho": rho,
            }
        )
        g = df.groupby([group_col, "reg"], as_index=False)["rho"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby([group_col, "reg"])
        .max("rho")
    )


def hll_distinct(ds, group_col: str, key_col: str, b: int = _HLL_B):
    """Approximate per-group COUNT(DISTINCT key) via a HyperLogLog sketch —
    the mergeable-sketch pattern: per-batch partial registers, one
    groupby-max shuffle of (group, register, rho) bounded by
    groups x 2^b rows (never by row count), final estimate per group.
    Standard error ~ 1.04/sqrt(2^b). Flajolet small-range (linear counting)
    correction included; accuracy vs exact asserted in tests.

    The estimate is a DETERMINISTIC, SQL-reproducible function of the
    (exact, hll_registers-oracled) register state (VERDICT r3 item 5): the
    harmonic sum is the EXACT integer S = sum 2^(SCALE-rho) + zeros*2^SCALE
    (dyadic terms, Python-int exact — no float accumulation-order
    dependence), and the float steps are a fixed IEEE op sequence
    (alpha*(m*m), *2^SCALE exact scaling, one division; libm log on the
    linear-counting branch; floor(e+0.5) final rounding — half-away, not
    banker's) that a DuckDB expression reproduces bit-for-bit."""
    m = 1 << b
    scale = 64 - b + 1  # max rho, so SCALE - rho >= 0
    regs = _hll_partial_registers(ds, group_col, key_col, b)

    def estimate(df):
        import math

        import pandas as pd

        rho = df["max(rho)"].to_numpy(dtype=np.int64)
        zeros = m - len(df)
        # exact integer harmonic sum via exponent counts (terms are powers
        # of two; int64 would overflow at 4096 * 2^52 — Python ints don't)
        cnt = np.bincount(scale - rho)
        s_num = sum(int(c) << e for e, c in enumerate(cnt) if c)
        s_num += zeros * (1 << scale)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = ((alpha * (m * m)) * float(1 << scale)) / float(s_num)
        if zeros > 0 and e <= 2.5 * m:
            e = m * math.log(m / zeros)  # linear-counting correction
        return pd.DataFrame(
            {
                group_col: [df[group_col].iloc[0]],
                "approx_distinct": [int(math.floor(e + 0.5))],
            }
        )

    return regs.groupby(group_col).map_groups(estimate, batch_format="pandas")


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
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("cell")
        .sum("partial_count")
    )


# ------------------------------------------------------ interval (band) join
def interval_join(
    left_ds,
    intervals,
    value_col: str,
    *,
    id_col: str = "interval_id",
    lo_col: str = "lo",
    hi_col: str = "hi",
):
    """Broadcast interval join: attach every matching interval id to each
    left row where ``lo <= value < hi``. The (small) interval table is
    broadcast ONCE via ``ray.put``; each batch evaluates one vectorized
    mask per interval — intervals MAY OVERLAP (a row joins every interval
    containing it), which a searchsorted bucketing cannot express.

    Scale contract: the interval side is plan-sized (bands, SLA buckets,
    histogram edges — tens to thousands), like the query matrices of knn /
    ann. A large interval side would need a range-partition exchange
    instead; this operator raises above ``_MAX_BROADCAST_INTERVALS`` to
    make that misuse loud."""
    import ray

    _MAX_BROADCAST_INTERVALS = 100_000
    ids = np.asarray([r[0] for r in intervals], dtype=np.int64)
    los = np.asarray([r[1] for r in intervals], dtype=np.float64)
    his = np.asarray([r[2] for r in intervals], dtype=np.float64)
    if len(ids) > _MAX_BROADCAST_INTERVALS:
        raise ValueError(
            f"{len(ids)} intervals exceed the broadcast contract "
            f"({_MAX_BROADCAST_INTERVALS}); range-partition the interval side"
        )
    ref = ray.put((ids, los, his))

    def join_batch(tbl: pa.Table) -> pa.Table:
        ids_, los_, his_ = ray.get(ref)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out_rows, out_iv = [], []
        for i in range(len(ids_)):
            m = (v >= los_[i]) & (v < his_[i])
            if m.any():
                rows = np.flatnonzero(m)
                out_rows.append(rows)
                out_iv.append(np.full(len(rows), ids_[i], dtype=np.int64))
        if not out_rows:
            empty = tbl.slice(0, 0)
            return empty.append_column(id_col, pa.array([], type=pa.int64()))
        rows = np.concatenate(out_rows)
        taken = tbl.take(pa.array(rows))
        return taken.append_column(
            id_col, pa.array(np.concatenate(out_iv))
        )

    return left_ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------- count-min sketch
CMS_SEEDS = (
    0x243F6A8885A308D3,  # pi digits — arbitrary fixed public constants,
    0x13198A2E03707344,  # kept below 2^62 so the SQL dual's nonnegative
    0x0A4093822299F31D,  # HUGEINT xor/divmod arithmetic stays exact
    0x082EFA98EC4E6C89,
)


def cms_sketch(ds, col: str, *, width: int = 1024, seeds=CMS_SEEDS):
    """Count-min sketch over an integer key column: ``depth x width``
    counters, ``bucket_j = splitmix64(key XOR seed_j) % width``. Per-batch
    partial cells merge by plain addition through one (j, bucket) groupby-sum
    shuffle — at most ``depth * width`` rows ever exist after the combine,
    so the sketch is O(depth*width) at any data size. DETERMINISTIC (fixed
    public seeds), which makes the whole sketch — not just its error bound —
    reproducible bit-for-bit in SQL (see CMS oracle in __ray_entry__).

    Returns a dense (depth, width) int64 numpy array of counters."""
    depth = len(seeds)
    w64 = np.uint64(width)
    seeds64 = [np.int64(s) for s in seeds]

    def partial(tbl: pa.Table) -> pa.Table:
        keys = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
        js, bs, ns = [], [], []
        for j in range(depth):
            b = (_splitmix64(keys ^ seeds64[j]) % w64).astype(np.int64)
            ub, cnt = np.unique(b, return_counts=True)
            js.append(np.full(len(ub), j, dtype=np.int64))
            bs.append(ub)
            ns.append(cnt.astype(np.int64))
        return pa.table(
            {
                "j": pa.array(np.concatenate(js)),
                "bucket": pa.array(np.concatenate(bs)),
                "n": pa.array(np.concatenate(ns)),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["j", "bucket"])
        .sum("n")
        .to_pandas()
    )
    out = np.zeros((depth, width), dtype=np.int64)
    out[cells["j"].to_numpy(), cells["bucket"].to_numpy()] = cells[
        "sum(n)"
    ].to_numpy()
    return out


def cms_estimate(cells: np.ndarray, keys, *, seeds=CMS_SEEDS) -> np.ndarray:
    """Point-frequency estimates for ``keys`` from a cms_sketch array:
    min over rows of the addressed counters. Standard CM guarantee:
    true_count <= est <= true_count + 2N/width with prob 1 - 2^-depth."""
    depth, width = cells.shape
    keys = np.asarray(keys, dtype=np.int64)
    w64 = np.uint64(width)
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        b = (_splitmix64(keys ^ np.int64(seeds[j])) % w64).astype(np.int64)
        est = np.minimum(est, cells[j, b])
    return est


# ----------------------------------------------------------- Bloom filter
def _key_ints(col) -> np.ndarray:
    """int64 identity for an exchange/bloom key column: integers pass
    through (nulls -> 0 — they can never match, downstream masks drop
    them), strings hash through hash64_strings. Same type contract as
    _shard_tagger."""
    import pyarrow.compute as pc

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(col.type):
        if col.null_count:
            col = pc.fill_null(col, 0)
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash64_strings(col).view(np.int64)
    raise TypeError(f"unsupported key type {col.type} for bloom/exchange")


def build_bloom_filter(ds, col: str, *, m_bits: int = 1 << 20, seeds=CMS_SEEDS):
    """Distributed Bloom filter over a key column: each batch sets its
    keys' bits in a local m_bits bitmap; bitmaps OR-merge in a bounded
    combiner pass (64 bitmaps per task) before the driver ORs the few
    survivors — bitmap traffic is O(n_blocks/64 * m_bits/8) through the
    object store and O(m_bits/8) at the driver.

    Returns (words uint64[m_bits/64], m_bits, seeds). False-positive rate
    with k=len(seeds) hashes: (1 - e^(-k n / m))^k — at the default 1 MiB /
    4 hashes that is <1% up to ~10^5 distinct keys; size m_bits ~ 10 bits
    per expected distinct key."""
    words = m_bits // 64

    def partial(tbl: pa.Table) -> pa.Table:
        keys = _key_ints(tbl[col])
        bm = np.zeros(words, dtype=np.uint64)
        for s in seeds:
            idx = (_splitmix64(keys ^ np.int64(s)) % np.uint64(m_bits)).astype(
                np.int64
            )
            np.bitwise_or.at(
                bm, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64)
            )
        return pa.table(
            {"bits": pa.array([bm.view(np.int64)], type=pa.list_(pa.int64(), words))}
        )

    def or_rows(tbl: pa.Table) -> pa.Table:
        mat = (
            tbl["bits"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(len(tbl), words)
            .view(np.uint64)
        )
        red = np.bitwise_or.reduce(mat, axis=0)
        return pa.table(
            {"bits": pa.array([red.view(np.int64)], type=pa.list_(pa.int64(), words))}
        )

    merged = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).map_batches(or_rows, batch_format="pyarrow", batch_size=64)
    final = np.zeros(words, dtype=np.uint64)
    for tbl in merged.iter_batches(batch_format="pyarrow", batch_size=None):
        mat = (
            tbl["bits"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(len(tbl), words)
            .view(np.uint64)
        )
        final |= np.bitwise_or.reduce(mat, axis=0)
    return final, m_bits, seeds


def bloom_may_contain(bloom, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True if every seed's bit is set (may
    contain — false positives possible, false negatives never)."""
    words, m_bits, seeds = bloom
    keep = np.ones(len(keys), dtype=bool)
    for s in seeds:
        idx = (_splitmix64(keys ^ np.int64(s)) % np.uint64(m_bits)).astype(np.int64)
        keep &= ((words[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1)).astype(bool)
    return keep


# ------------------------------------------------- connected components
def connected_components(
    edges_ds,
    nodes_ds,
    *,
    left_col: str = "left_id",
    right_col: str = "right_id",
    node_col: str = "doc_id",
    n_shards: int = 32,
    max_iters: int = 50,
    small_edge_limit: int = 2_000_000,
):
    """Distributed connected components by iterative min-label propagation —
    the operator that turns near-dup PAIRS into dedup CLUSTERS (keep one doc
    per component). Labels start as node ids; each round relabels every node
    to the min label among itself and its neighbors (one exchange join + one
    groupby-min); converges in O(component diameter) rounds — near-dup
    graphs are dense clusters with tiny diameters, and ``max_iters`` bounds
    pathological chains. Convergence is detected by the (monotonically
    decreasing) global label sum — one scalar per round to the driver.

    Small-graph fast path: when the (materialized) edge set has at most
    ``small_edge_limit`` rows, the whole solve collapses into ONE remote
    task — vectorized in-memory min-label propagation with pointer doubling
    over index-mapped arrays. Identical output by construction; it exists
    because each distributed round costs a fixed multi-exchange overhead
    that dwarfs the compute once the edge list fits a single worker's heap
    (a deep 50k-edge graph needs tens of rounds = tens of seconds of pure
    scheduling). At 100 TB the edge stream blows past the limit and the
    iterative path engages unchanged.

    Returns a Dataset (node_col, "cluster_id") where cluster_id is the
    component's min node id. Scale shape: each round shuffles only
    (node, label) pairs — never payloads; edges are re-joined from their
    (object-store resident) Dataset each round."""
    import ray

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= small_edge_limit:
        edge_refs = edges_ds.select_columns(
            [left_col, right_col]
        ).to_arrow_refs()
        node_refs = nodes_ds.select_columns([node_col]).to_arrow_refs()

        @ray.remote
        def _solve(n_edge_blocks, *blocks):
            import numpy as _np
            import pyarrow as _pa

            eb = blocks[:n_edge_blocks]
            nb = blocks[n_edge_blocks:]
            aa = [
                t.column(0).to_numpy(zero_copy_only=False).astype(_np.int64)
                for t in eb
                if t.num_rows
            ]
            bb = [
                t.column(1).to_numpy(zero_copy_only=False).astype(_np.int64)
                for t in eb
                if t.num_rows
            ]
            nn = [
                t.column(0).to_numpy(zero_copy_only=False).astype(_np.int64)
                for t in nb
                if t.num_rows
            ]
            a = _np.concatenate(aa) if aa else _np.empty(0, _np.int64)
            b = _np.concatenate(bb) if bb else _np.empty(0, _np.int64)
            base = _np.concatenate(nn) if nn else _np.empty(0, _np.int64)
            ids = _np.unique(_np.concatenate([base, a, b]))
            if len(ids) == 0:
                return _pa.table(
                    {
                        node_col: _pa.array([], _pa.int64()),
                        "cluster_id": _pa.array([], _pa.int64()),
                    }
                )
            ia = _np.searchsorted(ids, a)
            ib = _np.searchsorted(ids, b)
            lab = _np.arange(len(ids), dtype=_np.int64)
            while True:
                old = lab.copy()
                _np.minimum.at(lab, ia, lab[ib])
                _np.minimum.at(lab, ib, lab[ia])
                lab = _np.minimum(lab, lab[lab])
                lab = _np.minimum(lab, lab[lab])
                if _np.array_equal(lab, old):
                    break
            return _pa.table(
                {
                    node_col: _pa.array(ids),
                    "cluster_id": _pa.array(ids[lab]),
                }
            )

        out_ref = _solve.remote(
            len(edge_refs), *edge_refs, *node_refs
        )
        return ray.data.from_arrow_refs([out_ref])

    def as_labels(tbl: pa.Table) -> pa.Table:
        n = tbl[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    labels = nodes_ds.map_batches(
        as_labels, batch_format="pyarrow", batch_size=None
    ).materialize()

    def sym(tbl: pa.Table) -> pa.Table:
        a = tbl[left_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl[right_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(np.concatenate([b, a])),
                # pre-tag ONCE: every round's exchange re-splits the same
                # materialized blocks; re-tagging per round would add a
                # full edge-set map per iteration for nothing
                "_shard": pa.array(
                    ((src % np.int64(n_shards)) + n_shards) % n_shards
                ),
            }
        )

    edges = edges_ds.map_batches(
        sym, batch_format="pyarrow", batch_size=None
    ).materialize()

    def min_by_node(tbl: pa.Table) -> pa.Table:
        t = _drop_shard(tbl)
        if t.num_rows == 0 or "node" not in t.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((lab, n))
        n, lab = n[order], lab[order]
        heads = np.concatenate(([True], n[1:] != n[:-1]))
        return pa.table({"node": pa.array(n[heads]), "label": pa.array(lab[heads])})

    def prop_shard(te: pa.Table, tl: pa.Table) -> pa.Table:
        # neighbor labels for one shard: edges(src, dst) x labels(node=src)
        # -> (node=dst, label), projected inside the reduce (no extra map)
        import pandas as pd

        if "src" not in te.schema.names or "node" not in tl.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        e = _drop_shard(te).to_pandas()
        l = _drop_shard(tl).to_pandas()
        m = e.merge(l, left_on="src", right_on="node")
        return pa.table(
            {
                "node": pa.array(m["dst"].to_numpy()),
                "label": pa.array(m["label"].to_numpy()),
            }
        )

    def shortcut_shard(tl: pa.Table, tr: pa.Table) -> pa.Table:
        # pointer doubling: label' = label[label] — join labels-as-edges
        # (node, label) with labels keyed by node=label value
        import pandas as pd

        if "node" not in tl.schema.names or "node" not in tr.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        l = _drop_shard(tl).to_pandas()
        r = _drop_shard(tr).to_pandas()
        m = l.merge(
            r.rename(columns={"node": "_t", "label": "_l2"}),
            left_on="label",
            right_on="_t",
            how="left",
        )
        lab2 = m["_l2"].fillna(m["label"]).to_numpy().astype(np.int64)
        return pa.table(
            {"node": pa.array(m["node"].to_numpy()), "label": pa.array(lab2)}
        )

    prev_sum = None
    for _ in range(max_iters):
        labels_tagged = labels.map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        cand = hash_exchange2(
            edges, labels_tagged, "_shard", "_shard", n_shards, prop_shard
        )
        # min-combine via the repo's hash exchange (segment-min per shard)
        # rather than Ray's sort-based groupby: no per-round global sort,
        # and no schema-less empty blocks in the loop state
        tagged = labels.union(cand).map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        labels = hash_exchange(tagged, "_shard", n_shards, min_by_node)
        # pointer-doubling pass (label' = label[label]): collapses chain
        # components in O(log diameter) rounds instead of O(diameter) —
        # min-label result is unchanged (labels only ever DECREASE toward
        # the component min; following one extra hop is still a component
        # member's label)
        by_label = labels.map_batches(
            _shard_tagger("label", n_shards), batch_format="pyarrow", batch_size=None
        )
        by_node = labels.map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        labels = hash_exchange2(
            by_label, by_node, "_shard", "_shard", n_shards, shortcut_shard
        ).materialize()
        cur = labels.sum("label")
        if cur == prev_sum:
            break
        prev_sum = cur

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table({node_col: tbl["node"], "cluster_id": tbl["label"]})

    return labels.map_batches(project, batch_format="pyarrow", batch_size=None)


def cluster_canonical(
    clusters_ds,
    *,
    node_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    n_shards: int = 32,
):
    """Reduce a (node, cluster) assignment to ONE canonical row per cluster
    — the keep-list of a near-dup dedup (canonical = the cluster label,
    which connected_components defines as the component's min node id).
    One hash exchange co-locates each cluster's members; the shard fn emits
    (canonical node, cluster_size) per cluster via a vectorized segment
    count. Output columns: (node_col, "cluster_size")."""

    def per_shard(tbl: pa.Table) -> pa.Table:
        t = _drop_shard(tbl)
        if t.num_rows == 0 or cluster_col not in t.schema.names:
            return pa.table(
                {
                    node_col: pa.array([], pa.int64()),
                    "cluster_size": pa.array([], pa.int64()),
                }
            )
        c = t[cluster_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c.sort()
        heads = np.concatenate(([True], c[1:] != c[:-1]))
        idx = np.flatnonzero(heads)
        sizes = np.diff(np.append(idx, len(c)))
        return pa.table(
            {node_col: pa.array(c[idx]), "cluster_size": pa.array(sizes.astype(np.int64))}
        )

    tagged = clusters_ds.map_batches(
        _shard_tagger(cluster_col, n_shards), batch_format="pyarrow", batch_size=None
    )
    return hash_exchange(tagged, "_shard", n_shards, per_shard)


def pagerank_int(
    edges_ds,
    nodes_ds,
    *,
    left_col: str = "left_id",
    right_col: str = "right_id",
    node_col: str = "doc_id",
    iters: int = 3,
    n_shards: int = 32,
    r0: int = 1_000_000,
    base: int = 150_000,
    damp_num: int = 17,
    damp_den: int = 20,
):
    """Integer PageRank: power iteration in EXACT int64 arithmetic — the
    fixed-point analog of ``r <- (1-d)*r0 + d * A^T (r / outdeg)`` with
    d = damp_num/damp_den and every division floored. All quantities are
    64-bit integers, so the distributed result is bit-identical to a SQL
    dual unrolled over the same edge set (no float summation-order
    hazard). Directed edges as given (callers symmetrize for undirected
    graphs); dangling mass is dropped (simplified PageRank); nodes with no
    in-edges settle at ``base``. int64 headroom: per-node sums stay under
    max_indegree * r0 — scale r0 down for graphs beyond ~10^12 in-edges
    per node times units.

    Scale shape per iteration (x ``iters``): one two-sided exchange joins
    the (node, rank, outdeg) vector onto the src-partitioned edge set
    (only (dst, contrib) pairs leave), one exchange sums contribs by dst,
    one two-sided exchange left-joins the sums back onto the node vector.
    Edges (pre-tagged by src) and the degree-carrying node vector
    materialize ONCE and are re-split each round — the
    connected_components pattern."""
    import pandas as pd

    def as_edges(tbl: pa.Table) -> pa.Table:
        a = tbl[left_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl[right_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(a),
                "dst": pa.array(b),
                "_shard": pa.array(((a % np.int64(n_shards)) + n_shards) % n_shards),
            }
        )

    edges = edges_ds.map_batches(
        as_edges, batch_format="pyarrow", batch_size=None
    ).materialize()

    def deg_shard(tbl: pa.Table) -> pa.Table:
        t = _drop_shard(tbl)
        if t.num_rows == 0 or "src" not in t.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
            )
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        s.sort()
        heads = np.concatenate(([True], s[1:] != s[:-1]))
        idx = np.flatnonzero(heads)
        sizes = np.diff(np.append(idx, len(s)))
        return pa.table(
            {"node": pa.array(s[idx]), "deg": pa.array(sizes.astype(np.int64))}
        )

    degs = hash_exchange(edges, "_shard", n_shards, deg_shard)

    def as_nodes(tbl: pa.Table) -> pa.Table:
        n = tbl[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(n)})

    nodes = nodes_ds.map_batches(as_nodes, batch_format="pyarrow", batch_size=None)

    def attach_deg(tn: pa.Table, td: pa.Table) -> pa.Table:
        if "node" not in tn.schema.names:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                }
            )
        n = _drop_shard(tn).to_pandas()
        d = _drop_shard(td).to_pandas()
        if "node" not in d.columns:
            d = pd.DataFrame({"node": [], "deg": []})
        m = n.merge(d, on="node", how="left")
        deg = m["deg"].fillna(0).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(m["node"].to_numpy(dtype=np.int64)),
                "r": pa.array(np.full(len(m), r0, dtype=np.int64)),
                "deg": pa.array(np.asarray(deg, dtype=np.int64)),
            }
        )

    nodes_tagged = nodes.map_batches(
        _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
    )
    degs_tagged = degs.map_batches(
        _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
    )
    ranks = hash_exchange2(
        nodes_tagged, degs_tagged, "_shard", "_shard", n_shards, attach_deg
    ).materialize()

    def contrib_shard(te: pa.Table, tl: pa.Table) -> pa.Table:
        if "src" not in te.schema.names or "node" not in tl.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        e = _drop_shard(te).to_pandas()
        l = _drop_shard(tl).to_pandas()
        l = l[l["deg"] > 0]
        m = e.merge(l, left_on="src", right_on="node")
        c = m["r"].to_numpy(dtype=np.int64) // m["deg"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(m["dst"].to_numpy(dtype=np.int64)),
                "c": pa.array(c),
            }
        )

    def sum_shard(tbl: pa.Table) -> pa.Table:
        t = _drop_shard(tbl)
        if t.num_rows == 0 or "node" not in t.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(n, kind="stable")
        ns, cs = n[order], c[order]
        heads = np.concatenate(([True], ns[1:] != ns[:-1]))
        idx = np.flatnonzero(heads)
        csum = np.concatenate([[0], np.cumsum(cs)])
        bounds = np.append(idx, len(ns))
        return pa.table(
            {
                "node": pa.array(ns[idx]),
                "s": pa.array(csum[bounds[1:]] - csum[bounds[:-1]]),
            }
        )

    def update_shard(tl: pa.Table, ts: pa.Table) -> pa.Table:
        if "node" not in tl.schema.names:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                }
            )
        l = _drop_shard(tl).to_pandas()
        srt = _drop_shard(ts).to_pandas()
        if "node" not in srt.columns:
            srt = pd.DataFrame({"node": [], "s": []})
        m = l[["node", "deg"]].merge(srt, on="node", how="left")
        s = np.asarray(m["s"].fillna(0), dtype=np.int64) if "s" in m else np.zeros(
            len(m), dtype=np.int64
        )
        r = base + (s * damp_num) // damp_den
        return pa.table(
            {
                "node": pa.array(m["node"].to_numpy(dtype=np.int64)),
                "r": pa.array(r.astype(np.int64)),
                "deg": pa.array(m["deg"].to_numpy(dtype=np.int64)),
            }
        )

    for _ in range(iters):
        ranks_tagged = ranks.map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        contrib = hash_exchange2(
            edges, ranks_tagged, "_shard", "_shard", n_shards, contrib_shard
        )
        contrib_tagged = contrib.map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        sums = hash_exchange(contrib_tagged, "_shard", n_shards, sum_shard)
        sums_tagged = sums.map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        ranks = hash_exchange2(
            ranks_tagged, sums_tagged, "_shard", "_shard", n_shards, update_shard
        ).materialize()

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table({node_col: tbl["node"], "pr_units": tbl["r"]})

    return ranks.map_batches(project, batch_format="pyarrow", batch_size=None)


def bfs_hops(
    edges_ds,
    seeds_ds,
    *,
    left_col: str = "left_id",
    right_col: str = "right_id",
    node_col: str = "doc_id",
    iters: int = 3,
    n_shards: int = 32,
):
    """Bounded-depth BFS: minimum hop count from a SEED SET over a directed
    edge list, ``iters`` expansion rounds (nodes further than ``iters``
    hops are absent — callers choose the bound; an unbounded variant is
    connected_components' convergence loop). Exact integers, so the result
    is bit-identical to an unrolled SQL dual.

    Scale shape per round (the CC/pagerank pattern): edges pre-tagged by
    src and materialized ONCE; one two-sided exchange joins the current
    (node, hop) frontier onto the edge partition (only (dst, hop+1) pairs
    leave), then a min-combine exchange merges them into the label set —
    only (node, hop) pairs ever shuffle."""
    import pandas as pd

    def as_edges(tbl: pa.Table) -> pa.Table:
        a = tbl[left_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl[right_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(a),
                "dst": pa.array(b),
                "_shard": pa.array(((a % np.int64(n_shards)) + n_shards) % n_shards),
            }
        )

    edges = edges_ds.map_batches(
        as_edges, batch_format="pyarrow", batch_size=None
    ).materialize()

    def as_seeds(tbl: pa.Table) -> pa.Table:
        n = tbl[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": pa.array(n), "hop": pa.array(np.zeros(len(n), np.int64))}
        )

    labels = seeds_ds.map_batches(
        as_seeds, batch_format="pyarrow", batch_size=None
    ).materialize()

    def expand_shard(te: pa.Table, tl: pa.Table) -> pa.Table:
        if "src" not in te.schema.names or "node" not in tl.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "hop": pa.array([], pa.int64())}
            )
        e = _drop_shard(te).to_pandas()
        l = _drop_shard(tl).to_pandas()
        m = e.merge(l, left_on="src", right_on="node")
        return pa.table(
            {
                "node": pa.array(m["dst"].to_numpy(dtype=np.int64)),
                "hop": pa.array(m["hop"].to_numpy(dtype=np.int64) + 1),
            }
        )

    def min_by_node(tbl: pa.Table) -> pa.Table:
        t = _drop_shard(tbl)
        if t.num_rows == 0 or "node" not in t.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "hop": pa.array([], pa.int64())}
            )
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["hop"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, n))
        n, h = n[order], h[order]
        heads = np.concatenate(([True], n[1:] != n[:-1]))
        return pa.table({"node": pa.array(n[heads]), "hop": pa.array(h[heads])})

    for _ in range(iters):
        lt = labels.map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        cand = hash_exchange2(edges, lt, "_shard", "_shard", n_shards, expand_shard)
        tagged = labels.union(cand).map_batches(
            _shard_tagger("node", n_shards), batch_format="pyarrow", batch_size=None
        )
        labels = hash_exchange(tagged, "_shard", n_shards, min_by_node).materialize()

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table({node_col: tbl["node"], "hops": tbl["hop"]})

    return labels.map_batches(project, batch_format="pyarrow", batch_size=None)


# ----------------------------------------------------------------- pivot
def pivot(
    ds,
    *,
    key_col: str,
    pivot_col: str,
    value_col: str,
    categories: list[str],
    count_name: str = "n_rows",
    suffix: str = "",
):
    """Wide pivot by conditional aggregation: one output column per category
    holding sum(value_col) where pivot_col == category, plus a total row
    count per key. Scale shape: each batch collapses to at most
    (distinct keys in batch) x (len(categories)+2) partial cells inside
    map_batches — vectorized np.add.at over a searchsorted category index —
    and only those partials reach the (small) groupby-sum shuffle; the raw
    stream never shuffles. Category list must be known (pass the output of
    a cheap distinct pass); unknown categories are ignored, matching
    SUM(CASE WHEN pivot=c ...) semantics."""
    import pandas as pd

    cats = sorted(categories)
    cat_arr = np.array(cats)
    colnames = [f"{c}{suffix}" for c in cats]

    def partial(tbl: pa.Table) -> pa.Table:
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        piv = np.asarray(tbl[pivot_col].to_numpy(zero_copy_only=False), dtype=object)
        vals = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        ci = np.searchsorted(cat_arr, piv.astype(str))
        ci = np.clip(ci, 0, len(cats) - 1)
        known = cat_arr[ci] == piv.astype(str)
        out = {key_col: uk}
        mat = np.zeros((len(uk), len(cats)), dtype=np.int64)
        np.add.at(mat, (inv[known], ci[known]), vals[known])
        for j, name in enumerate(colnames):
            out[name] = mat[:, j]
        cnt = np.zeros(len(uk), dtype=np.int64)
        np.add.at(cnt, inv, 1)
        out[count_name] = cnt
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    agg_cols = colnames + [count_name]
    g = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(
        key_col
    ).sum(agg_cols)

    def project(tbl: pa.Table) -> pa.Table:
        cols = {key_col: tbl[key_col]}
        for name in agg_cols:
            cols[name] = tbl[f"sum({name})"].cast(pa.int64())
        return pa.table(cols)

    return g.map_batches(project, batch_format="pyarrow", batch_size=None)


# ----------------------------------------------------------- window rank
def window_rank(
    ds,
    *,
    part_col: str,
    order_col: str,
    tiebreak_col: str | None = None,
    descending: bool = False,
    method: str = "row_number",
    rank_col: str = "rank",
    part_size_col: str | None = None,
    n_shards: int = 64,
):
    """Per-partition window rank — ROW_NUMBER() / DENSE_RANK() OVER
    (PARTITION BY part_col ORDER BY order_col [DESC][, tiebreak_col]).
    One hash exchange co-locates each partition's rows; the shard fn ranks
    every partition in the shard with ONE np.lexsort + segment arithmetic
    (no per-group Python). With ``method="row_number"`` a tiebreak column
    should be supplied for determinism. Appends ``rank_col`` (1-based);
    with ``part_size_col`` also appends the partition row count (COUNT(*)
    OVER (PARTITION BY part_col)) so percent_rank/cume_dist derive as
    exact integer ratios downstream."""
    if method not in ("row_number", "dense_rank"):
        raise ValueError("method must be 'row_number' or 'dense_rank'")

    def per_shard(tbl: pa.Table) -> pa.Table:
        t = _drop_shard(tbl).combine_chunks()
        if t.num_rows == 0 or part_col not in t.schema.names:
            if not t.num_columns:
                return t
            t = t.append_column(rank_col, pa.array([], pa.int64()))
            if part_size_col is not None:
                t = t.append_column(part_size_col, pa.array([], pa.int64()))
            return t
        part = t[part_col].to_numpy(zero_copy_only=False)
        order = t[order_col].to_numpy(zero_copy_only=False)
        keys = [order]
        if tiebreak_col is not None:
            keys.insert(0, t[tiebreak_col].to_numpy(zero_copy_only=False))
        if descending:
            # negate numerics; lexsort has no per-key order flag
            keys[-1] = -keys[-1]
        keys.append(part)  # primary: partition
        idx = np.lexsort(keys)
        p_sorted = part[idx]
        starts = np.concatenate(([True], p_sorted[1:] != p_sorted[:-1]))
        if method == "row_number":
            pos = np.arange(len(idx), dtype=np.int64)
            base = np.maximum.accumulate(np.where(starts, pos, 0))
            rank_sorted = pos - base + 1
        else:
            o_sorted = order[idx]
            new_val = np.concatenate(([True], o_sorted[1:] != o_sorted[:-1])) | starts
            steps = np.cumsum(new_val.astype(np.int64))
            base = np.maximum.accumulate(np.where(starts, steps, 0))
            rank_sorted = steps - base + 1
        rank = np.empty(len(idx), dtype=np.int64)
        rank[idx] = rank_sorted
        t = t.append_column(rank_col, pa.array(rank))
        if part_size_col is not None:
            starts_idx = np.flatnonzero(starts)
            sizes = np.diff(np.append(starts_idx, len(idx)))
            size_sorted = np.repeat(sizes, sizes)
            size = np.empty(len(idx), dtype=np.int64)
            size[idx] = size_sorted
            t = t.append_column(part_size_col, pa.array(size))
        return t

    tagged = ds.map_batches(
        _shard_tagger(part_col, n_shards), batch_format="pyarrow", batch_size=None
    )
    return hash_exchange(tagged, "_shard", n_shards, per_shard)


# ------------------------------------------------------- triangle count
def triangle_count(
    edges_ds,
    *,
    left_col: str = "left_id",
    right_col: str = "right_id",
    n_shards: int = 32,
):
    """Distributed triangle count over an undirected SIMPLE graph given as
    canonical (a < b) edge pairs: the classic two-join plan — a wedge join
    (e1.b = e2.a gives ordered wedges a<b<c, so each triangle is built
    exactly once) then a closing semi-join of the wedge's (a, c) key
    against the edge-key set. Keys pack as (a << 32) | c, so node ids must
    fit in uint32 (guarded). Both joins are the engine's bounded hash
    exchanges; nothing reaches the driver but the final count. Returns a
    1-row Dataset {"n_triangles": int64}."""
    import ray

    def canon(tbl: pa.Table) -> pa.Table:
        a = tbl[left_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl[right_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        if len(lo) and (lo.min() < 0 or hi.max() >= 2**32):
            raise ValueError("triangle_count packs (a, c) into int64: node ids must be in [0, 2^32)")
        return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                         "k": pa.array((lo << 32) | hi)})

    edges = edges_ds.map_batches(canon, batch_format="pyarrow", batch_size=None).materialize()

    wedges = equi_join(
        edges.select_columns(["a", "b"]),
        edges.select_columns(["a", "b"]),
        on="b", right_on="a", n_shards=n_shards,
    )

    def wedge_key(tbl: pa.Table) -> pa.Table:
        if "a" not in tbl.schema.names:
            return pa.table({"k": pa.array([], pa.int64())})
        a = tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = tbl["b_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array((a << 32) | c)})

    keys = wedges.map_batches(wedge_key, batch_format="pyarrow", batch_size=None)
    closed = equi_join(
        keys, edges.select_columns(["k"]), on="k", how="semi", n_shards=n_shards
    )
    n = closed.count()
    return ray.data.from_arrow(pa.table({"n_triangles": pa.array([n], pa.int64())}))


def triangle_per_node(
    edges_ds,
    *,
    left_col: str = "left_id",
    right_col: str = "right_id",
    n_shards: int = 32,
):
    """Per-node triangle participation + degree over an undirected simple
    graph — the local clustering-coefficient ingredients (coefficient =
    2*n_tri / (deg*(deg-1)), left to the consumer as exact ints). Same
    wedge-join + closing-semi-join plan as triangle_count, but the wedge
    rows keep their (a, b, c) labels through the closing filter and each
    surviving triangle flat-maps to its three member nodes for one final
    groupby-sum; degrees fold from the symmetrized edge list in a second
    tiny groupby. Returns (node, n_tri, deg). Node ids must fit uint32
    (same packing guard)."""
    import ray

    def canon(tbl: pa.Table) -> pa.Table:
        a = tbl[left_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl[right_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        if len(lo) and (lo.min() < 0 or hi.max() >= 2**32):
            raise ValueError(
                "triangle_per_node packs (a, c) into int64: node ids must be in [0, 2^32)"
            )
        return pa.table(
            {"a": pa.array(lo), "b": pa.array(hi), "k": pa.array((lo << 32) | hi)}
        )

    edges = edges_ds.map_batches(
        canon, batch_format="pyarrow", batch_size=None
    ).materialize()

    wedges = equi_join(
        edges.select_columns(["a", "b"]),
        edges.select_columns(["a", "b"]),
        on="b", right_on="a", n_shards=n_shards,
    )

    def wedge_rows(tbl: pa.Table) -> pa.Table:
        if "a" not in tbl.schema.names:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64()), "k": pa.array([], pa.int64())}
            )
        a = tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = tbl["b_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b), "c": pa.array(c),
             "k": pa.array((a << 32) | c)}
        )

    tri = equi_join(
        wedges.map_batches(wedge_rows, batch_format="pyarrow", batch_size=None),
        edges.select_columns(["k"]),
        on="k", how="semi", n_shards=n_shards,
    )

    def member_partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "a" not in tbl.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.int64())}
            )
        nodes = np.concatenate(
            [
                tbl["a"].to_numpy(zero_copy_only=False),
                tbl["b"].to_numpy(zero_copy_only=False),
                tbl["c"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        u, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(u), "partial": pa.array(cnt.astype(np.int64))}
        )

    tri_counts = (
        tri.map_batches(member_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .sum("partial")
    )

    def deg_partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "a" not in tbl.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.int64())}
            )
        nodes = np.concatenate(
            [
                tbl["a"].to_numpy(zero_copy_only=False),
                tbl["b"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        u, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(u), "partial": pa.array(cnt.astype(np.int64))}
        )

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .sum("partial")
    )

    def rn(name):
        def f(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0 or tbl.num_columns != 2:
                return pa.table(
                    {"node": pa.array([], pa.int64()),
                     name: pa.array([], pa.int64())}
                )
            return tbl.rename_columns(["node", name])

        return f

    tri_counts = tri_counts.map_batches(
        rn("n_tri"), batch_format="pyarrow", batch_size=None
    )
    degrees = degrees.map_batches(
        rn("deg"), batch_format="pyarrow", batch_size=None
    )
    joined = equi_join(degrees, tri_counts, on="node", how="left")

    def final(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "node" not in tbl.schema.names:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "n_tri": pa.array([], pa.int64()),
                 "deg": pa.array([], pa.int64())}
            )
        if "n_tri" not in tbl.schema.names:
            # left rows whose shard saw no triangle table at all
            return pa.table(
                {
                    "node": tbl["node"].cast(pa.int64()),
                    "n_tri": pa.array(
                        np.zeros(tbl.num_rows, dtype=np.int64)
                    ),
                    "deg": tbl["deg"].cast(pa.int64()),
                }
            )
        nt = tbl["n_tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        nt = np.nan_to_num(nt, nan=0.0).astype(np.int64)
        return pa.table(
            {
                "node": tbl["node"].cast(pa.int64()),
                "n_tri": pa.array(nt),
                "deg": tbl["deg"].cast(pa.int64()),
            }
        )

    return joined.map_batches(final, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------- unpivot
def unpivot(
    ds,
    *,
    key_cols: list[str],
    value_cols: list[str],
    var_col: str = "variable",
    value_col: str = "value",
):
    """UNPIVOT / melt: turn one row with N value columns into N rows of
    (key_cols..., variable, value). Pure per-batch map — embarrassingly
    parallel, no shuffle; the exact inverse of ops.pivot's layout. Value
    columns must share one Arrow type."""

    def melt(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        k = len(value_cols)
        out = {}
        for kc in key_cols:
            col = tbl[kc].combine_chunks()
            out[kc] = col.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), k)))
        out[var_col] = pa.array(np.tile(np.array(value_cols, dtype=object), n))
        vals = [tbl[vc].combine_chunks() for vc in value_cols]
        mat = np.empty((n, k), dtype=object if not n else None)
        if n:
            mat = np.column_stack([v.to_numpy(zero_copy_only=False) for v in vals])
            out[value_col] = pa.array(mat.ravel())
        else:
            out[value_col] = pa.array([], vals[0].type if vals else pa.int64())
        return pa.table(out)

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------- skyline
def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D maxima set (Pareto frontier, maximize both):
    row i survives iff no row j has x_j >= x_i AND y_j >= y_i with at least
    one strict. Duplicate (x, y) points all survive. One lexsort + two
    segment scans — no pairwise comparisons."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))  # x desc, then y desc
    xs, ys = x[order], y[order]
    heads = np.concatenate([[True], xs[1:] != xs[:-1]])
    grp = np.cumsum(heads) - 1  # dense group id per distinct x, desc order
    # max y within each x-group (first element of the group: y desc in group)
    starts = np.flatnonzero(heads)
    gmax = ys[starts]
    # best y among all STRICTLY larger x = running max over previous groups
    prev_best = np.concatenate([[-np.inf], np.maximum.accumulate(gmax)[:-1]])
    keep_sorted = (ys == gmax[grp]) & (ys > prev_best[grp])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline(ds, x_col: str, y_col: str):
    """Distributed 2-D skyline (maximize x_col and y_col): the maxima set is
    union-stable — skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B) — so each batch
    keeps its local frontier (expected O(log n) rows) and one final pass over
    the concatenated partials computes the global answer. Driver sees only
    the partial frontiers, never the data. Returns a pyarrow Table with the
    input schema."""

    def local(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        m = _skyline_mask(
            tbl[x_col].to_numpy(zero_copy_only=False).astype(np.float64),
            tbl[y_col].to_numpy(zero_copy_only=False).astype(np.float64),
        )
        return tbl.filter(pa.array(m))

    parts = list(
        ds.map_batches(local, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return parts[0] if parts else pa.table({})
    allp = pa.concat_tables(nonempty, promote_options="default")
    m = _skyline_mask(
        allp[x_col].to_numpy(zero_copy_only=False).astype(np.float64),
        allp[y_col].to_numpy(zero_copy_only=False).astype(np.float64),
    )
    return allp.filter(pa.array(m))


# --------------------------------------------------------------- convex hull
def _hull_chain(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over (n, 2) int64 points with EXACT integer
    cross products; returns the hull vertices CCW from the lexicographic
    minimum. Strict turns — points interior to a hull edge are excluded.
    An Akl-Toussaint prefilter (discard everything strictly inside the
    quadrilateral of the four axis-extreme points) vectorizes away the bulk
    before the short Python chain over the O(sqrt-ish) survivors."""
    if len(pts) == 0:
        return pts.reshape(0, 2).astype(np.int64)
    pts = np.unique(pts.astype(np.int64), axis=0)  # lex sort + dedupe
    n = len(pts)
    if n > 16:
        x, y = pts[:, 0], pts[:, 1]
        quad = pts[  # W, S, E, N: counter-clockwise
            [int(np.argmin(x)), int(np.argmin(y)),
             int(np.argmax(x)), int(np.argmax(y))]
        ]
        inside = np.ones(n, dtype=bool)
        for k in range(4):
            a, b = quad[k], quad[(k + 1) % 4]
            # strictly left of every CCW quad edge => interior, droppable
            cross = (b[0] - a[0]) * (y - a[1]) - (b[1] - a[1]) * (x - a[0])
            inside &= cross > 0
        pts = pts[~inside]
        n = len(pts)
    if n <= 2:
        return pts

    def half(p):
        h: list[tuple[int, int]] = []
        for px, py in p:
            while len(h) >= 2:
                ox, oy = h[-2]
                ax, ay = h[-1]
                if (ax - ox) * (py - oy) - (ay - oy) * (px - ox) <= 0:
                    h.pop()
                else:
                    break
            h.append((int(px), int(py)))
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def convex_hull(ds, x_col: str, y_col: str):
    """Distributed 2-D convex hull: hull(A ∪ B) ⊆ hull(A) ∪ hull(B), so each
    batch reduces to its local hull (O(log n) expected vertices on random
    points) and one final chain over the concatenated partials yields the
    global hull — the skyline reduce shape. Driver sees only partial hulls.
    Returns a pyarrow Table (x_col, y_col) of hull vertices."""

    def local(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {x_col: pa.array([], pa.int64()), y_col: pa.array([], pa.int64())}
            )
        pts = np.stack(
            [
                tbl[x_col].to_numpy(zero_copy_only=False).astype(np.int64),
                tbl[y_col].to_numpy(zero_copy_only=False).astype(np.int64),
            ],
            axis=1,
        )
        h = _hull_chain(pts)
        return pa.table(
            {x_col: pa.array(h[:, 0]), y_col: pa.array(h[:, 1])}
        )

    parts = list(
        ds.map_batches(local, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table(
            {x_col: pa.array([], pa.int64()), y_col: pa.array([], pa.int64())}
        )
    allp = pa.concat_tables(nonempty, promote_options="default")
    pts = np.stack(
        [
            allp[x_col].to_numpy(zero_copy_only=False).astype(np.int64),
            allp[y_col].to_numpy(zero_copy_only=False).astype(np.int64),
        ],
        axis=1,
    )
    h = _hull_chain(pts)
    return pa.table({x_col: pa.array(h[:, 0]), y_col: pa.array(h[:, 1])})


# ------------------------------------------- temporal proximity count join
def proximity_count(
    ds,
    *,
    left_type: str,
    right_type: str,
    window_us: int,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_shards: int = 16,
):
    """Stream-stream temporal join primitive: for every row of `left_type`,
    the COUNT of `right_type` rows of the same user within ±window_us
    (inclusive). One user-keyed exchange co-locates each user's rows; per
    shard a composite dense-rank key makes one searchsorted pair serve every
    probe (no per-row loops, no per-user slicing). Scale shape: only
    (user, ts, id, is_left) quads shuffle; window membership never explodes
    rows because the output is a count."""

    def keyed(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(tbl[type_col], value_set=pa.array([left_type, right_type]))
        t = tbl.filter(m)
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(((u % n_shards) + n_shards) % n_shards),
                "user_id": pa.array(u),
                "ts_us": t[ts_col].cast(pa.int64()),
                "event_id": t[id_col],
                "is_left": pc.equal(t[type_col], left_type),
            }
        )

    def shard(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "user_id" not in tbl.schema.names:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "n_near": pa.array([], pa.int64()),
                }
            )
        u = tbl["user_id"].to_numpy(zero_copy_only=False)
        ts = tbl["ts_us"].to_numpy(zero_copy_only=False)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False)
        is_l = tbl["is_left"].to_numpy(zero_copy_only=False)
        t0 = ts.min()
        rel = ts - t0
        span_u = int(rel.max()) + 2 * window_us + 2
        # dense user ranks keep the composite key within int64 for any user
        # id domain; the shard's user count bounds the product.
        uu = np.unique(u)
        ur = np.searchsorted(uu, u).astype(np.int64)
        if (len(uu)) * span_u >= np.iinfo(np.int64).max:
            raise ValueError("proximity_count: shard key span overflow")
        comp = ur * span_u + rel
        rights = np.sort(comp[~is_l])
        base = ur[is_l] * span_u
        probe = comp[is_l]
        lo = np.maximum(probe - window_us, base)
        hi = np.minimum(probe + window_us, base + span_u - 1)
        n = np.searchsorted(rights, hi, "right") - np.searchsorted(rights, lo, "left")
        return pa.table(
            {
                "event_id": pa.array(eid[is_l]),
                "n_near": pa.array(n.astype(np.int64)),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
    return hash_exchange(keyed_ds, "shard", n_shards, shard)

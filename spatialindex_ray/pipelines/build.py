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
    h = hashlib.sha1()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
    return h.hexdigest()[:16]


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
        lambda tbl: _geom_filter(tbl, plan), batch_format="pyarrow"
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


def region_count_bounds(
    cell_count_table: pa.Table, plan, *, count_level: int, data_level: int = 20
):
    """Estimate [min, max] count from a per-cell count table without touching
    data (J3 analog): cells fully inside the (uncompressed) region ranges
    contribute to min; cells intersecting ranges contribute to max."""
    cells = cell_count_table["cell"].to_numpy(zero_copy_only=False)
    counts = cell_count_table["n_rows"].to_numpy(zero_copy_only=False)
    shift = 2 * (count_level - plan["level"])
    if shift >= 0:
        coarse = cells >> shift
    else:
        coarse = cells << (-shift)
    m = ops.ranges_mask(coarse, plan["ranges"])
    mx = int(counts[m].sum())
    return 0, mx  # without per-cell geometry the safe lower bound is 0

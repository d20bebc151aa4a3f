"""Index build / resume / query-index pipeline tests + salted dedup."""

import json
import os
import shutil

import numpy as np
import pytest

from spatialindex_ray import SpatialIndex, ops, pipelines
from spatialindex_ray.sources import webpages
from spatialindex_ray.state.manifest import Manifest


@pytest.fixture()
def built_index(ray_session, tmp_path):
    src = str(tmp_path / "src")
    webpages.synth_webpages(3000, hot_frac=0.02).write_parquet(src)
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    out_dir = str(tmp_path / "index")
    manifest = pipelines.build.build_index(files, out_dir, shard_size=3)
    return files, out_dir, manifest


def test_build_and_query(built_index):
    files, out_dir, manifest = built_index
    assert manifest.total_rows() == 3000
    si = SpatialIndex()
    plan = si.cone_plan(83.2, 12.5, 40.0, mode=1, level=7)
    res = pipelines.build.query_index(out_dir, plan).take_all()
    # oracle: brute force over the encoded source
    import ray

    enc = ops.encode(ray.data.read_parquet(files), url_col="url")
    all_rows = enc.take_all()
    import math

    from spatialindex_ray import geom

    cone = geom.Cone(83.2, 12.5, 40.0)
    exp = {
        r["url"]
        for r in all_rows
        if r["x"] * cone.center[0] + r["y"] * cone.center[1] + r["z"] * cone.center[2]
        >= cone.cosrad
    }
    got = {r["url"] for r in res}
    assert got == exp


def test_resume_skips_completed_shards(built_index):
    files, out_dir, m1 = built_index
    before = {k: v["completed_at"] for k, v in m1.partitions().items()}
    # re-run: all shards complete + fingerprints match -> nothing recomputed
    m2 = pipelines.build.build_index(files, out_dir, shard_size=3)
    after = {k: v["completed_at"] for k, v in m2.partitions().items()}
    assert before == after
    # invalidate one shard's fingerprint -> only that shard recomputes
    mpath = os.path.join(out_dir, "_manifest.json")
    data = json.load(open(mpath))
    k0 = sorted(data["partitions"])[0]
    data["partitions"][k0]["input_fingerprint"] = "stale"
    json.dump(data, open(mpath, "w"))
    m3 = pipelines.build.build_index(files, out_dir, shard_size=3)
    after3 = m3.partitions()
    assert after3[k0]["completed_at"] != before[k0]
    for k in before:
        if k != k0:
            assert after3[k]["completed_at"] == before[k]
    assert m3.total_rows() == 3000


def test_region_count_and_bounds(built_index, ray_session):
    files, out_dir, _ = built_index
    si = SpatialIndex()
    plan = si.cone_plan(200.0, -30.0, 25.0, mode=1, level=7)
    exact = pipelines.build.region_count(out_dir, plan)
    # bounds from a per-cell count table
    import ray

    enc = ops.encode(ray.data.read_parquet(files), url_col="url")
    counts = ops.cell_counts(enc, "hpx20", out_level=7)
    import pyarrow as pa

    tbl = counts.to_pandas().rename(columns={"sum(partial_count)": "n_rows"})
    lo, hi = pipelines.build.region_count_bounds(
        pa.Table.from_pandas(tbl), plan, count_level=7
    )
    assert lo <= exact <= hi


def test_dedup_rows_salted(ray_session):
    n = 2000
    pages = webpages.synth_webpages(n, hot_frac=0.05)
    enc = ops.encode(pages, url_col="url")
    out = ops.dedup_rows(enc, n_salt=8).take_all()
    urls = [r["url"] for r in out]
    assert len(urls) == len(set(urls))
    # distinct url count == synth formula: hot rows collapse
    hot_rows = {r for r in range(n) if r % 20 == 0}
    hot_urls = {
        f"hot{(i // 20) % 5}/{((i // 20) // 5) % 50}" for i in hot_rows
    }
    expected = (n - len(hot_rows)) + len(hot_urls)
    assert len(urls) == expected
    # salting must not lose text integrity
    by_url = {r["url"]: r["text"] for r in out}
    ref = {r["url"]: r["text"] for r in pages.take_all()}
    for u, t in by_url.items():
        assert ref[u] == t

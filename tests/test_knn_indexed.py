"""Indexed kNN ring-expansion vs brute-force oracle."""

import os

import numpy as np
import pytest

from spatialindex_ray import ops, pipelines
from spatialindex_ray.sources import webpages

COUNT_LEVEL = 5


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("knnidx")
    src = str(tmp / "src")
    webpages.synth_webpages(5000, hot_frac=0.0).write_parquet(src)
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    out = str(tmp / "idx")
    pipelines.build.build_index(files, out, shard_size=4)
    import ray

    enc = ops.encode(ray.data.read_parquet(files), url_col="url")
    counts_df = ops.cell_counts(enc, "hpx20", out_level=COUNT_LEVEL).to_pandas()
    col = [c for c in counts_df.columns if c.startswith("sum")][0]
    counts = dict(zip(counts_df["cell"].astype(int), counts_df[col].astype(int)))
    rows = enc.take_all()
    return out, counts, rows


def test_knn_indexed_matches_brute(index_dir):
    out, counts, rows = index_dir
    queries = [(0, 10.0, 10.0), (1, 200.0, -45.0), (2, 310.5, 72.0), (3, 0.01, -89.0)]
    k = 8
    got = pipelines.build.knn_indexed(
        out, counts, queries, k, count_level=COUNT_LEVEL
    ).to_pandas()

    xyz = np.array([[r["x"], r["y"], r["z"]] for r in rows])
    urls = np.array([r["url"] for r in rows])
    for qid, qlon, qlat in queries:
        qv = ops.xyz_from_lonlat(np.array([qlon]), np.array([qlat]))[0]
        d2 = ((xyz - qv) ** 2).sum(axis=1)
        order = np.lexsort((urls, d2))[:k]
        expect = list(urls[order])
        mine = list(got[got["query_id"] == qid].sort_values("rank")["url"])
        assert mine == expect, qid

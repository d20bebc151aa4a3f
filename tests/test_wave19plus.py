"""Edge-case tests for wave 19-27 engine paths (the oracle sweep covers the
full-table hash equality; these pin the boundary semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from spatialindex_ray import ops


def _events_ds(ray, rows):
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows["ts"]), dtype=np.int64)),
            "user_id": pa.array(np.array(rows["user"], dtype=np.int64)),
            "ts": pa.array(np.array(rows["ts"], dtype=np.int64).astype("datetime64[us]")),
            "event_type": pa.array(rows["typ"], type=pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)


@pytest.mark.usefixtures("ray_session")
def test_proximity_window_boundary_inclusive():
    import ray

    w = 1000
    # click exactly at +w and -w must COUNT (<=, both ends inclusive)
    ds = _events_ds(
        ray,
        {
            "user": [1, 1, 1, 1, 1],
            "ts": [10_000, 10_000 + w, 10_000 - w, 10_000 + w + 1, 10_000 - w - 1],
            "typ": ["error", "click", "click", "click", "click"],
        },
    )
    out = ops.proximity_count(
        ds, left_type="error", right_type="click", window_us=w, n_shards=2
    ).to_pandas()
    assert len(out) == 1 and int(out["n_near"].iloc[0]) == 2


@pytest.mark.usefixtures("ray_session")
def test_proximity_user_isolation():
    import ray

    ds = _events_ds(
        ray,
        {
            "user": [1, 2, 2],
            "ts": [5_000, 5_000, 5_500],
            "typ": ["error", "click", "click"],
        },
    )
    out = ops.proximity_count(
        ds, left_type="error", right_type="click", window_us=10_000, n_shards=4
    ).to_pandas()
    assert int(out["n_near"].iloc[0]) == 0  # other user's clicks never leak


def test_skyline_duplicates_survive():
    x = np.array([5.0, 5.0, 1.0])
    y = np.array([5.0, 5.0, 9.0])
    m = ops._skyline_mask(x, y)
    assert list(m) == [True, True, True]  # equal maxima both kept


def test_skyline_strict_dominance_only():
    # (3,3) dominated by (3,4); (3,4) and (4,3) are incomparable
    x = np.array([3.0, 3.0, 4.0])
    y = np.array([3.0, 4.0, 3.0])
    assert list(ops._skyline_mask(x, y)) == [False, True, True]


def test_zorder_cover_degenerate():
    from spatialindex_ray.kernels import geohash as ghk

    # single-cell rectangle -> exactly one range of length 1
    r = ghk.zorder_cover(5, 5, 9, 9, 6)
    assert r.shape == (1, 2) and r[0, 0] == r[0, 1]
    # full domain -> one range covering everything
    r = ghk.zorder_cover(0, 63, 0, 63, 6)
    assert r.shape == (1, 2) and r[0, 0] == 0 and r[0, 1] == 64 * 64 - 1


def test_geohash_lon_wrap_and_poles():
    from spatialindex_ray.kernels import geohash as ghk

    # lon >= 180 re-maps to negative; 359.9999 and -0.0001 same cell
    a = ghk.geohash_strings(np.array([359.999999]), np.array([0.0]), 6)
    b = ghk.geohash_strings(np.array([-0.000001 + 360.0]), np.array([0.0]), 6)
    assert a[0] == b[0]
    # poles clamp, never throw
    s = ghk.geohash_strings(np.array([0.0, 0.0]), np.array([90.0, -90.0]), 6)
    assert len(s) == 2


@pytest.mark.usefixtures("ray_session")
def test_edit_distance_bucket_cap_keeps_clusters_connected():
    import ray

    from spatialindex_ray.functions import dedup

    # 10 identical slugs: uncapped => 45 pairs; cap=3 => chain pairs only,
    # but the pair graph must still connect all 10 docs
    texts = ["identical text!!"] * 10 + ["zz completely different %d" % i for i in range(5)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(15, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    pairs = dedup.edit_distance_query(ds, limit=None, bucket_cap=3).to_pandas()
    parent = list(range(15))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for _, r in pairs.iterrows():
        ra, rb = find(int(r.left_id)), find(int(r.right_id))
        parent[ra] = rb
    roots = {find(i) for i in range(10)}
    assert len(roots) == 1  # all identical docs in one component


@pytest.mark.usefixtures("ray_session")
def test_range_window_peers_included():
    # three events, two at the same timestamp: RANGE frame includes peers
    import ray

    import __ray_entry__ as entry

    tbl = pa.table(
        {
            "event_id": pa.array(np.array([0, 1, 2], dtype=np.int64)),
            "event_type": pa.array(["a", "a", "a"], type=pa.string()),
            "ts": pa.array(np.array([1_000, 1_000, 2_000], dtype=np.int64).astype(
                "datetime64[us]"
            )),
            "value": pa.array([1.0, 2.0, 4.0]),
        }
    )
    import tempfile, os

    d = tempfile.mkdtemp(dir="/tmp")
    import pyarrow.parquet as pq

    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = entry._events_range_window(d).to_pandas().set_index("event_id")
    # events 0 and 1 are mutual peers: both see n=2, sum=3000 milli
    assert int(out.loc[0, "n_window"]) == 2 and int(out.loc[0, "sum_milli"]) == 3000
    assert int(out.loc[1, "n_window"]) == 2
    # event 2 sees all three (within 1h) -> n=3
    assert int(out.loc[2, "n_window"]) == 3


@pytest.mark.usefixtures("ray_session")
def test_late_events_watermark_resets_per_user():
    import ray

    import __ray_entry__ as entry
    import tempfile, os
    import pyarrow.parquet as pq

    # user 1's late event must not be influenced by user 2's watermark;
    # dense per-user streams (5-minute grid) guarantee the 24h jitter
    # produces real late arrivals
    n = 240
    users = np.repeat(np.array([1, 2], dtype=np.int64), n // 2)
    ts = np.concatenate(
        [np.arange(n // 2) * 300_000_000, np.arange(n // 2) * 300_000_000]
    ).astype(np.int64)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_type": pa.array(["a"] * n, type=pa.string()),
            "value": pa.array([0.0] * n),
            "props": pa.array(["{}"] * n, type=pa.string()),
        }
    )
    d = tempfile.mkdtemp(dir="/tmp")
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    res = entry._late_events(d).to_pandas()
    # compute the dual in pandas
    import pandas as pd

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["arrival"] = df["ts_us"] + (df["event_id"] * entry.LATE_DELAY_MUL) % entry.LATE_DELAY_MOD
    df = df.sort_values(["user_id", "arrival", "event_id"])
    prev = df.groupby("user_id")["ts_us"].cummax().groupby(df["user_id"]).shift(1)
    late = (prev - df["ts_us"]) > entry.LATE_THRESHOLD_US
    want = set(df.loc[late.fillna(False), "event_id"])
    got = set(res["event_id"]) if "event_id" in res.columns else set()
    assert want, "test setup must produce at least one late event"
    assert got == want

"""Edge-case tests for wave 34 (CUSUM change point, phrase search,
feature hashing, blocked record linkage)."""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402


def _write_events_days(tmp, day_counts):
    """day_counts: list of events per consecutive day for one type."""
    day = 86_400_000_000
    ts = []
    for d, c in enumerate(day_counts):
        ts.extend(d * day + np.arange(c))
    n = len(ts)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(["click"] * n, type=pa.string()),
            "value": pa.array(np.zeros(n)),
            "props": pa.array([""] * n, type=pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp}/events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_cusum_flat_series_zero(tmp_path):
    _write_events_days(tmp_path, [3, 3, 3, 3])
    out = entry._cusum_changepoint(str(tmp_path)).to_pandas()
    assert int(out["cusum_max"].iloc[0]) == 0
    assert int(out["cusum_min"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_cusum_step_change_day(tmp_path):
    # 4 low days then 4 high days: |CUSUM| peaks at the last low day
    _write_events_days(tmp_path, [1, 1, 1, 1, 5, 5, 5, 5])
    out = entry._cusum_changepoint(str(tmp_path)).to_pandas()
    assert int(out["change_day"].iloc[0]) == 3
    assert int(out["cusum_min"].iloc[0]) < 0 <= int(out["cusum_max"].iloc[0])


def _write_docs(tmp, texts):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts], np.int64)),
        }
    )
    pq.write_table(tbl, f"{tmp}/documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_phrase_token_exact_and_no_cross_doc(tmp_path):
    # doc0 matches; doc1 reversed order no; doc2 substring-in-token no;
    # doc3/doc4 split across docs must NOT match (row-boundary guard)
    _write_docs(
        tmp_path,
        [
            "a merge sort b",
            "sort merge",
            "xmerge sort",
            "ends with merge",
            "sort starts",
        ],
    )
    out = entry._phrase_search(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0]


@pytest.mark.usefixtures("ray_session")
def test_phrase_multiple_occurrences_one_row(tmp_path):
    _write_docs(tmp_path, ["merge sort merge sort"])
    out = entry._phrase_search(str(tmp_path)).to_pandas()
    assert out["doc_id"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
def test_feature_hashing_prefix_collision_and_totals(tmp_path):
    # tokens sharing the first 7 bytes land in the SAME bucket by design
    _write_docs(tmp_path, ["abcdefgh abcdefgz xy"])
    out = entry._feature_hashing(str(tmp_path)).to_pandas()
    assert int(out["cnt"].sum()) == 3
    by_bucket = out.set_index("bucket")["cnt"]
    assert 2 in by_bucket.values  # the two prefix-colliding tokens merged


def _write_customers(tmp, keys, bals, segs):
    tbl = pa.table(
        {
            "c_custkey": pa.array(np.array(keys, dtype=np.int64)),
            "c_name": pa.array([f"c{k}" for k in keys], pa.string()),
            "c_nationkey": pa.array(np.zeros(len(keys), dtype=np.int32)),
            "c_acctbal": pa.array(np.array(bals, dtype=np.float64)),
            "c_mktsegment": pa.array(list(segs), pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp}/customer.parquet")


@pytest.mark.usefixtures("ray_session")
def test_record_linkage_boundary_inclusive_and_blocked(tmp_path):
    # diff exactly $100.00 -> INCLUDED; same balance different segment ->
    # excluded by blocking; each pair appears once with cust_a < cust_b
    _write_customers(
        tmp_path,
        [1, 2, 3, 4],
        [500.00, 600.00, 500.00, 720.01],
        ["AUTO", "AUTO", "HOUSE", "AUTO"],
    )
    out = entry._record_linkage(str(tmp_path)).to_pandas()
    pairs = set(zip(out["cust_a"], out["cust_b"]))
    assert pairs == {(1, 2)}
    assert int(out["diff_cents"].iloc[0]) == 10_000

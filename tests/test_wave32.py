"""Edge-case tests for wave 32 (sweep-line concurrency, weighted median,
Gini, bitmap intersection, lag-1 autocorrelation). The oracle sweep covers
full-table hash equality; these pin boundary semantics."""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402


def _write_events(tmp, ts_us, types, users=None):
    n = len(ts_us)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.array(ts_us, dtype=np.int64).astype("datetime64[us]")
            ),
            "user_id": pa.array(
                np.array(users if users is not None else [0] * n, dtype=np.int64)
            ),
            "event_type": pa.array(list(types), type=pa.string()),
            "value": pa.array(np.zeros(n)),
            "props": pa.array([""] * n, type=pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp}/events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_max_concurrency_boundary_touch_counts(tmp_path):
    # Interval ends sort AFTER starts at the same instant: an interval
    # starting exactly when another ends momentarily overlaps it (the
    # oracle's (t, kind) tie rule) -> peak 2, not 1.
    h = entry.EVENT_HOLD_US
    _write_events(tmp_path, [0, h, 2 * h + 1], ["click"] * 3)
    out = entry._max_concurrency(str(tmp_path)).to_pandas()
    assert len(out) == 1 and int(out["max_concurrent"].iloc[0]) == 2


@pytest.mark.usefixtures("ray_session")
def test_max_concurrency_per_type_isolated(tmp_path):
    # 3 overlapping clicks + 1 lone view: cumsum must reset at the type
    # boundary (per-type deltas sum to zero), so view reports 1.
    _write_events(tmp_path, [0, 1, 2, 0], ["click", "click", "click", "view"])
    out = (
        entry._max_concurrency(str(tmp_path))
        .to_pandas()
        .set_index("event_type")["max_concurrent"]
    )
    assert int(out["click"]) == 3 and int(out["view"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_lower_at_even_split(tmp_path):
    # weights 1/1 over prices 10.00/20.00: 2*cw >= W first holds at the
    # LOWER price (discrete weighted median, no interpolation).
    tbl = pa.table(
        {
            "l_returnflag": pa.array(["A", "A"], pa.string()),
            "l_extendedprice": pa.array([10.0, 20.0]),
            "l_quantity": pa.array([1.0, 1.0]),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")
    out = entry._weighted_median(str(tmp_path)).to_pandas()
    assert int(out["wmedian_cents"].iloc[0]) == 1000
    assert int(out["total_w"].iloc[0]) == 2


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_weight_dominates(tmp_path):
    # heavy weight on the high price pulls the median up regardless of
    # row order.
    tbl = pa.table(
        {
            "l_returnflag": pa.array(["A"] * 3, pa.string()),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
            "l_quantity": pa.array([1.0, 1.0, 10.0]),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/lineitem.parquet")
    out = entry._weighted_median(str(tmp_path)).to_pandas()
    assert int(out["wmedian_cents"].iloc[0]) == 3000


def _write_gini_dims(tmp, prices, custkeys):
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array(np.array(custkeys, dtype=np.int64)),
                "o_totalprice": pa.array(np.array(prices, dtype=np.float64)),
            }
        ),
        f"{tmp}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.array(sorted(set(custkeys)), np.int64)),
                "c_nationkey": pa.array(
                    np.zeros(len(set(custkeys)), dtype=np.int32)
                ),
            }
        ),
        f"{tmp}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0], pa.int32()),
                "n_regionkey": pa.array([0], pa.int32()),
            }
        ),
        f"{tmp}/nation.parquet",
    )


@pytest.mark.usefixtures("ray_session")
def test_gini_zero_for_equal_values(tmp_path):
    _write_gini_dims(tmp_path, [100.0] * 4, [1, 2, 3, 4])
    out = entry._order_gini(str(tmp_path)).to_pandas()
    assert int(out["gini_num"].iloc[0]) == 0
    assert int(out["n_orders"].iloc[0]) == 4


@pytest.mark.usefixtures("ray_session")
def test_gini_max_concentration(tmp_path):
    # one order holds all value: num = (2n - n - 1) * x = (n-1)*x
    _write_gini_dims(tmp_path, [0.0, 0.0, 0.0, 100.0], [1, 2, 3, 4])
    out = entry._order_gini(str(tmp_path)).to_pandas()
    assert int(out["gini_num"].iloc[0]) == 3 * 10000
    assert int(out["sum_cents"].iloc[0]) == 10000


@pytest.mark.usefixtures("ray_session")
def test_bitmap_intersect_word_boundaries(tmp_path):
    # users 63/64/127/128 straddle 64-bit word boundaries; overlap must be
    # exact across words, and the A-only user must not leak into the count.
    users = [63, 64, 127, 128, 5, 63, 64, 127, 128]
    types = ["click"] * 5 + ["view"] * 4
    _write_events(tmp_path, list(range(len(users))), types, users)
    out = entry._bitmap_intersect(str(tmp_path)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["type_a"], row["type_b"]) == ("click", "view")
    assert int(row["n_common"]) == 4


@pytest.mark.usefixtures("ray_session")
def test_bitmap_intersect_no_overlap_absent(tmp_path):
    # disjoint user sets -> the pair row must be ABSENT (not n_common=0),
    # matching the SQL join's empty group.
    _write_events(tmp_path, [0, 1], ["click", "view"], [1, 2])
    out = entry._bitmap_intersect(str(tmp_path)).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_autocorr_constant_series_is_zero(tmp_path):
    # same count every day -> centered terms all zero -> num = den = 0
    day = 86_400_000_000
    ts = [0, 1, day, day + 1, 2 * day, 2 * day + 1]
    _write_events(tmp_path, ts, ["click"] * 6)
    out = entry._autocorr_daily(str(tmp_path)).to_pandas()
    assert int(out["n_days"].iloc[0]) == 3
    assert int(out["ac_num"].iloc[0]) == 0
    assert int(out["ac_den"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_autocorr_alternating_is_negative(tmp_path):
    # counts 2,1,2,1: adjacent centered products are negative
    day = 86_400_000_000
    ts = [0, 1, day, 2 * day, 2 * day + 1, 3 * day]
    _write_events(tmp_path, ts, ["click"] * 6)
    out = entry._autocorr_daily(str(tmp_path)).to_pandas()
    assert int(out["ac_num"].iloc[0]) < 0
    assert int(out["ac_den"].iloc[0]) > 0

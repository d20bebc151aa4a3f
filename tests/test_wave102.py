"""Wave 102: quantile time series, growth accounting — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_quantiles_by_period_brute(ray_session):
    out = (
        entry._quantiles_by_period(SF)
        .to_pandas()
        .set_index(["event_type", "period"])
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    ev["ts_us"] = ev["ts"].astype("int64")
    lo = ev["ts_us"].min()
    span = ev["ts_us"].max() - lo + 1
    ev["period"] = np.minimum((ev["ts_us"] - lo) * 4 // span, 3)
    for (ty, p), g in ev.groupby(["event_type", "period"]):
        a = np.sort(g["value"].to_numpy())
        row = out.loc[(ty, p)]
        assert row["n_events"] == len(a)
        # quantile_disc: element at 1-based rank ceil(q*n)
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            import math

            assert row[col] == a[math.ceil(q * len(a)) - 1]
    assert len(out) == 20


def test_growth_accounting_brute(ray_session):
    out = entry._orders_growth_accounting(SF).to_pandas().set_index("category")
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    orders["d"] = orders["o_orderdate"].astype("int64")
    mid = (orders["d"].min() + orders["d"].max()) // 2
    orders["cents"] = np.round(orders["o_totalprice"].to_numpy() * 100.0).astype(
        np.int64
    )
    want = {}
    total_delta = 0
    for _, g in orders.groupby("o_custkey"):
        r1 = int(g[g["d"] <= mid]["cents"].sum())
        r2 = int(g[g["d"] > mid]["cents"].sum())
        if r1 == 0:
            c = "new"
        elif r2 == 0:
            c = "churned"
        elif r2 >= r1:
            c = "expansion"
        else:
            c = "contraction"
        n, d = want.get(c, (0, 0))
        want[c] = (n + 1, d + abs(r2 - r1))
        total_delta += r2 - r1
    got = {c: (r["n_customers"], r["delta_cents"]) for c, r in out.iterrows()}
    assert got == want
    # the growth bridge identity holds exactly in cents
    signed = (
        got.get("new", (0, 0))[1]
        + got.get("expansion", (0, 0))[1]
        - got.get("contraction", (0, 0))[1]
        - got.get("churned", (0, 0))[1]
    )
    assert signed == total_delta

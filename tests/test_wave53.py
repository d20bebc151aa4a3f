"""Wave 53: the remaining TPC-H join shapes (Q21 sole-late-supplier,
Q12 latency bands, Q9 nation/year profit) — brute-force pandas duals and
the invariants the SQL oracles share."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def _late_join():
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority"],
    )
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["lat_us"] = j["l_shipdate"].astype("int64") - j["o_orderdate"].astype("int64")
    return j


def test_q21_matches_brute(ray_session):
    out = entry._q21_waiting_supplier(SF).to_pandas()
    j = _late_join()
    j = j[j["o_orderstatus"] == "F"]
    late_us = entry.Q21_LATE_DAYS * 86400000000
    j["late"] = j["lat_us"] > late_us
    per = j.groupby("l_orderkey").agg(
        n_supp=("l_suppkey", "nunique"),
        n_late=("l_suppkey", lambda s: 0),  # placeholder, fixed below
    )
    lsupp = (
        j[j["late"]].groupby("l_orderkey")["l_suppkey"].agg(["nunique", "max"])
    )
    per["n_late"] = lsupp["nunique"].reindex(per.index).fillna(0).astype(int)
    per["late_supp"] = lsupp["max"].reindex(per.index)
    q = per[(per["n_supp"] > 1) & (per["n_late"] == 1)]
    sup = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"])
    want = (
        q.merge(sup, left_on="late_supp", right_on="s_suppkey")
        .groupby("s_name")
        .size()
        .rename("numwait")
        .reset_index()
    )
    got = out.sort_values("s_name").reset_index(drop=True)
    want = want.sort_values("s_name").reset_index(drop=True)
    assert got["s_name"].tolist() == want["s_name"].tolist()
    assert got["numwait"].astype(int).tolist() == want["numwait"].astype(int).tolist()


def test_q12_counts_partition_total(ray_session):
    out = entry._q12_latency_bands(SF).to_pandas()
    j = _late_join()
    fast_us = entry.Q12_FAST_DAYS * 86400000000
    hi = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    fast = j["lat_us"] <= fast_us
    want = {
        ("FAST", "hi"): int((fast & hi).sum()),
        ("FAST", "lo"): int((fast & ~hi).sum()),
        ("SLOW", "hi"): int((~fast & hi).sum()),
        ("SLOW", "lo"): int((~fast & ~hi).sum()),
    }
    got = out.set_index("band")
    for band in ("FAST", "SLOW"):
        assert int(got.loc[band, "high_line_count"]) == want[(band, "hi")]
        assert int(got.loc[band, "low_line_count"]) == want[(band, "lo")]
    # bands partition the joined lineitems
    assert int(out[["high_line_count", "low_line_count"]].sum().sum()) == len(j)


def test_q9_profit_matches_brute(ray_session):
    out = entry._q9_nation_profit(SF).to_pandas()
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_name"])
    keep = set(part[part["p_name"].str.contains(entry.Q9_PART_TOKEN)]["p_partkey"])
    li = li[li["l_partkey"].isin(keep)].copy()
    sup = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    li = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    bps = np.round(li["l_discount"].to_numpy() * 10000).astype(np.int64)
    li["profit_unit"] = cents * (10000 - bps)
    li["yr"] = li["l_shipdate"].dt.year
    want = (
        li.groupby(["n_name", "yr"], as_index=False)["profit_unit"].sum()
        .sort_values(["n_name", "yr"])
        .reset_index(drop=True)
    )
    got = out.sort_values(["n_name", "yr"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["profit_unit"].to_numpy() == want["profit_unit"].to_numpy()).all()
    assert got["n_name"].tolist() == want["n_name"].tolist()

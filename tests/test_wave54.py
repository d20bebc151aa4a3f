"""Wave 54: partsupp-free TPC-H shapes (Q2 min-cost supplier, Q11 important
parts, Q16 distinct-supplier counts, Q20 dominant-share suppliers) —
brute-force pandas duals."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def _li():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def test_q2_argmin_matches_brute(ray_session):
    out = entry._q2_min_cost_supplier(SF).to_pandas()
    li = _li()
    sup = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    sup = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    region_sup = set(sup[sup["n_regionkey"] == entry.Q2_REGIONKEY]["s_suppkey"])
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_size"])
    small = set(part[part["p_size"] <= entry.Q2_SIZE_MAX]["p_partkey"])
    li = li[li["l_suppkey"].isin(region_sup) & li["l_partkey"].isin(small)].copy()
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    li["cost"] = cents * 1000 // li["l_quantity"].to_numpy().astype(np.int64)
    ps = li.groupby(["l_partkey", "l_suppkey"], as_index=False)["cost"].min()
    best = ps.groupby("l_partkey")["cost"].min()
    want = {}
    for pk, g in ps.groupby("l_partkey"):
        b = best[pk]
        want[pk] = (int(g[g["cost"] == b]["l_suppkey"].min()), int(b))
    got = out.set_index("p_partkey")
    assert len(got) == len(want)
    for pk, (sk, c) in want.items():
        assert int(got.loc[pk, "s_suppkey"]) == sk
        assert int(got.loc[pk, "unit_cost"]) == c


def test_q11_threshold_and_totals(ray_session):
    out = entry._q11_important_parts(SF).to_pandas()
    li = _li()
    sup = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    keep = set(sup[sup["s_nationkey"] == entry.Q11_NATIONKEY]["s_suppkey"])
    li = li[li["l_suppkey"].isin(keep)].copy()
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    bps = np.round(li["l_discount"].to_numpy() * 10000).astype(np.int64)
    li["v"] = cents * (10000 - bps)
    per = li.groupby("l_partkey")["v"].sum()
    thr = int(per.sum()) // entry.Q11_FRAC_DEN
    want = per[per > thr]
    got = out.set_index("l_partkey")["value_unit"]
    assert len(got) == len(want)
    assert (got.sort_index().to_numpy() == want.sort_index().to_numpy()).all()


def test_q16_distinct_supplier_counts(ray_session):
    out = entry._q16_supplier_counts(SF).to_pandas()
    li = _li()[["l_partkey", "l_suppkey"]]
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    sup = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    ok_sup = set(sup[sup["s_acctbal"] >= entry.Q16_MIN_ACCTBAL]["s_suppkey"])
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[(j["p_brand"] != entry.Q16_EXCLUDED_BRAND) & j["l_suppkey"].isin(ok_sup)]
    want = (
        j.groupby(["p_brand", "p_size"])["l_suppkey"].nunique().rename("supplier_cnt")
    )
    got = out.set_index(["p_brand", "p_size"])["supplier_cnt"]
    assert len(got) == len(want)
    assert (got.sort_index().to_numpy() == want.sort_index().to_numpy()).all()


def test_q20_share_filter(ray_session):
    out = entry._q20_dominant_suppliers(SF).to_pandas()
    li = _li()
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_name"])
    fam = set(part[part["p_name"].str.contains(entry.Q20_PART_TOKEN)]["p_partkey"])
    lo, hi = np.datetime64(entry.Q20_YEAR_LO), np.datetime64(entry.Q20_YEAR_HI)
    li = li[
        li["l_partkey"].isin(fam)
        & (li["l_shipdate"].to_numpy() >= lo)
        & (li["l_shipdate"].to_numpy() < hi)
    ].copy()
    li["q"] = li["l_quantity"].astype(np.int64)
    pair = li.groupby(["l_partkey", "l_suppkey"], as_index=False)["q"].sum()
    tot = pair.groupby("l_partkey")["q"].sum().rename("tot")
    pair = pair.merge(tot, on="l_partkey")
    winners = set(pair[pair["q"] * entry.Q20_SHARE_MUL > pair["tot"]]["l_suppkey"])
    assert set(out["s_suppkey"]) == winners
    sup = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = sup.set_index("s_suppkey")["s_name"]
    assert (out.set_index("s_suppkey")["s_name"] == names[out["s_suppkey"]].values).all()  # noqa: PD011

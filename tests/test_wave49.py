"""Waves 49-50: Pareto coverage point, decile migration, nearest-in-time
join, BPE pair statistics, kNN majority classification — brute-force duals
and tie-break invariants the SQL oracles share."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions import text as textfn  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_revenue_pareto_matches_brute(ray_session):
    out = entry._revenue_pareto(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    rev = pd.DataFrame({"c": orders["o_custkey"], "v": cents}).groupby("c")["v"].sum()
    v = np.sort(rev.to_numpy())[::-1]
    total = int(v.sum())
    pfx = np.concatenate([[0], np.cumsum(v)[:-1]])
    need = entry.PARETO_DEN * pfx < entry.PARETO_NUM * total
    assert int(out["n_customers"].iloc[0]) == int(need.sum())
    assert int(out["covered_cents"].iloc[0]) == int(v[need].sum())
    assert int(out["total_cents"].iloc[0]) == total
    # the head must actually cover >= 4/5
    assert 5 * int(v[need].sum()) >= 4 * total


def test_decile_transition_row_counts(ray_session):
    out = entry._decile_transition(SF).to_pandas()
    # every decile pair count is positive; total = customers active in BOTH
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    split = np.datetime64(entry.DECILE_SPLIT)
    a = set(orders[orders["o_orderdate"] < split]["o_custkey"])
    b = set(orders[orders["o_orderdate"] >= split]["o_custkey"])
    assert int(out["n_customers"].sum()) == len(a & b)
    assert out["dec_before"].between(1, 10).all()
    assert out["dec_after"].between(1, 10).all()


def test_nearest_event_join_brute(ray_session):
    out = entry._nearest_event_join(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "event_type", "ts"])
    ev["t"] = ev["ts"].astype("int64")
    err = ev[ev["event_type"] == entry.NEAREST_FROM_TYPE]
    clk = ev[ev["event_type"] == entry.NEAREST_TO_TYPE]
    want = {}
    for u, g in err.groupby("user_id"):
        cg = clk[clk["user_id"] == u]
        if len(cg) == 0:
            continue
        for r in g.itertuples():
            c = cg.assign(d=(cg["t"] - r.t).abs())
            c = c.sort_values(["d", "t", "event_id"]).iloc[0]
            want[r.event_id] = (int(c["event_id"]), int(c["d"]))
    got = {int(r.event_id): (int(r.nearest_click), int(r.dt_us))
           for r in out.itertuples()}
    assert got == want


def test_bpe_top_merges_brute(ray_session):
    out = textfn.bpe_top_merges_query(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter

    c = Counter()
    for t in docs["text"]:
        for tok in t.split():
            for i in range(len(tok) - 1):
                c[(tok[i], tok[i + 1])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: textfn.BPE_TOP_K]
    got = list(zip(zip(out["a"], out["b"]), out["n"]))
    assert [(p, int(n)) for p, n in got] == [(p, n) for p, n in want]


def test_spatial_knn_classify_deterministic(ray_session):
    out1 = entry._spatial_knn_classify(SF)
    out2 = entry._spatial_knn_classify(SF)
    assert out1.equals(out2)
    assert len(out1) == len(entry.KNN_CLASSIFY_QUERIES)
    assert (out1["votes"] >= 1).all() and (out1["votes"] <= entry.KNN_CLASSIFY_K).all()


# ------------------------------------------------------------- wave 51
def test_orders_backlog_brute(ray_session):
    out = entry._orders_backlog(SF).to_pandas().sort_values("day")
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderdate"])
    od = orders["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    days = np.unique(np.concatenate([od, od + entry.BACKLOG_WINDOW_DAYS]))
    want = {
        int(d): int(((od <= d) & (d < od + entry.BACKLOG_WINDOW_DAYS)).sum())
        for d in days
    }
    got = {int(r.day): int(r.backlog) for r in out.itertuples()}
    assert got == want
    # conservation: backlog returns to zero after the last close
    assert got[int(days.max())] == 0


def test_rfm_segments_totals_and_code_range(ray_session):
    out = entry._rfm_segments(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    assert int(out["n_customers"].sum()) == orders["o_custkey"].nunique()
    codes = out["rfm_code"].to_numpy()
    r, f, m = codes // 100, (codes // 10) % 10, codes % 10
    for q in (r, f, m):
        assert ((1 <= q) & (q <= entry.RFM_K)).all()


# ------------------------------------------------------------- wave 52
def test_prefix_containment_brute(ray_session):
    from spatialindex_ray.functions import dedup

    out = dedup.prefix_containment_query(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs[docs["doc_id"] < dedup.PREFIX_DOC_LIMIT]
    txt = dict(zip(docs["doc_id"], docs["text"]))
    want = set()
    for s, st in txt.items():
        if len(st) < dedup.PREFIX_MIN_CHARS:
            continue
        for l, lt in txt.items():
            if s != l and len(st) < len(lt) and lt.startswith(st):
                want.add((s, l))
    got = set(zip(out["short_id"], out["long_id"])) if len(out) else set()
    assert got == want

"""Wave 103: TPC-H Q4 analog, winnow pair evidence — brutes."""

import sys
from collections import Counter, defaultdict
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from tests.test_wave84 import _brute_fingerprints  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_q4_brute(ray_session):
    out = entry._q4_priority_late(SF).to_pandas()
    got = dict(zip(out["o_orderpriority"], out["order_count"]))
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    li["sd"] = li["l_shipdate"].astype("int64")
    orders["od"] = orders["o_orderdate"].astype("int64")
    late_us = entry.Q4_LATE_DAYS * 86400000000
    j = li.merge(orders[["o_orderkey", "od", "o_orderpriority"]],
                 left_on="l_orderkey", right_on="o_orderkey")
    late_orders = j[j["sd"] > j["od"] + late_us]["o_orderkey"].unique()
    sub = orders[orders["o_orderkey"].isin(late_orders)]
    want = sub.groupby("o_orderpriority").size().to_dict()
    assert got == want
    assert 0 < sum(want.values()) < len(orders)  # EXISTS is selective


def test_winnow_evidence_brute(ray_session):
    out = entry._winnow_pair_evidence(SF)
    got = set(
        zip(out["left_id"], out["right_id"], out["pos_l"], out["pos_r"],
            out["gram_hash"])
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    # brute winnow selections WITH positions
    B, M = 1099511628211, 1 << 64
    K, W = 8, 4
    firstpos = defaultdict(dict)  # doc -> hash -> min pos (1-based)
    sets = {}
    for did, s in zip(docs["doc_id"], docs["text"]):
        bs = s.encode()
        hs = []
        for i in range(len(bs) - K + 1):
            h = 0
            for ch in bs[i : i + K]:
                h = (h * B + ch) % M
            hs.append(h)
        chosen = set()
        for e in range(W - 1, len(hs)):
            winh = hs[e - W + 1 : e + 1]
            mn = min(winh)
            off = max(j for j in range(W) if winh[j] == mn)
            chosen.add(e - W + 1 + off)
        sel = {}
        for p in sorted(chosen):
            hv = hs[p]
            sv = hv - M if hv >= 1 << 63 else hv
            if sv not in sel:
                sel[sv] = p + 1
        firstpos[did] = sel
        sets[did] = set(sel)
    # qualifying pairs on the DF-capped counts
    dfreq = Counter(h for s in sets.values() for h in s)
    filt = {d: {h for h in s if dfreq[h] <= entry.WINNOW_DF_CAP} for d, s in sets.items()}
    ids = sorted(filt)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if len(filt[a] & filt[b]) >= entry.WINNOW_EV_T:
                for h in sets[a] & sets[b]:
                    want.add((a, b, firstpos[a][h], firstpos[b][h], h))
    assert got == want
    assert want

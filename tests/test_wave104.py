"""Wave 104: cohort LTV, dedup funnel — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_cohort_ltv_brute(ray_session):
    out = entry._orders_cohort_ltv(SF).to_pandas()
    got = {
        (r["cohort"], r["age"]): (r["revenue_cents"], r["n_orders"])
        for _, r in out.iterrows()
    }
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    orders["d"] = orders["o_orderdate"].astype("int64")
    lo = orders["d"].min()
    span = orders["d"].max() - lo + 1
    orders["q"] = np.minimum((orders["d"] - lo) * 4 // span, 3)
    orders["cents"] = np.round(orders["o_totalprice"].to_numpy() * 100.0).astype(
        np.int64
    )
    cohort = orders.groupby("o_custkey")["q"].min()
    want = {}
    for _, r in orders.iterrows():
        c = cohort[r["o_custkey"]]
        k = (c, r["q"] - c)
        rev, n = want.get(k, (0, 0))
        want[k] = (rev + r["cents"], n + 1)
    assert got == want
    # ages are non-negative and cohort-0 carries the longest tail
    assert all(a >= 0 for _, a in want)


def test_dedup_funnel_brute(ray_session):
    from spatialindex_ray.functions import dedup

    out = entry._dedup_funnel_report(SF).set_index("stage")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ntok = {d: len(t.split()) for d, t in zip(docs["doc_id"], docs["text"])}
    assert out.loc["raw", "n_docs"] == len(docs)
    assert out.loc["raw", "n_tokens"] == sum(ntok.values())
    keep_exact = set(docs.groupby("text")["doc_id"].min())
    assert out.loc["exact_dedup", "n_docs"] == len(keep_exact)
    assert out.loc["exact_dedup", "n_tokens"] == sum(ntok[d] for d in keep_exact)
    canon = set(entry._dedup_canonical(SF).to_pandas()["doc_id"])
    keep_near = {
        d for d in keep_exact if d >= dedup.NGRAM_DOC_LIMIT or d in canon
    }
    assert out.loc["near_dedup", "n_docs"] == len(keep_near)
    assert out.loc["near_dedup", "n_tokens"] == sum(ntok[d] for d in keep_near)
    # the funnel is monotone
    assert (
        out.loc["raw", "n_docs"]
        >= out.loc["exact_dedup", "n_docs"]
        >= out.loc["near_dedup", "n_docs"]
    )

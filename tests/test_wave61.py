"""Wave 61: last-touch purchase attribution (banded-cummax forward fill)
and exact per-vector medians — brute duals incl. per-user boundary cases."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_purchase_attribution_brute(ray_session):
    out = entry._purchase_attribution(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    want = {}
    for _, g in ev.groupby("user_id"):
        last_nonbuy = None
        for t in g["event_type"]:
            if t == entry.ATTR_TARGET:
                k = last_nonbuy if last_nonbuy is not None else "direct"
                want[k] = want.get(k, 0) + 1
            else:
                last_nonbuy = t
    got = dict(zip(out["attr_type"], out["n_buys"].astype(int)))
    assert got == want
    # totals conserve: every purchase is attributed exactly once
    n_buys = int((ev["event_type"] == entry.ATTR_TARGET).sum())
    assert sum(got.values()) == n_buys


def test_embedding_median_brute(ray_session):
    out = entry._embedding_median(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = dict(zip(out["vec_id"].astype(int), out["median_micros2"].astype(int)))
    for vid, vec in zip(emb["vec_id"], emb["embedding"]):
        v = np.sort(np.round(np.asarray(vec, dtype=np.float64) * 1_000_000).astype(np.int64))
        d = len(v)
        want = int(v[d // 2 - 1] + v[d // 2])
        assert got[int(vid)] == want

"""Wave 88: corpus filter report, reorder depth — brutes."""

import sys
from collections import Counter
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_corpus_filter_report_brute(ray_session):
    out = entry._corpus_filter_report(SF).to_pandas()
    got = dict(zip(out["doc_id"], zip(out["fail_mask"], out["keep"])))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        ws = text.split()
        words = len(ws)
        sum_len = sum(len(w) for w in ws)
        stop = sum(1 for w in ws if w in ("the", "a"))
        maxcnt = max(Counter(ws).values()) if ws else 0
        m = 0
        if not words >= 30:
            m |= 1
        if not (words > 0 and 3 * words <= sum_len <= 6 * words):
            m |= 2
        if not (words > 0 and 20 * stop >= words):
            m |= 4
        if not (words > 0 and 5 * maxcnt <= words):
            m |= 8
        want[did] = (m, m == 0)
    assert got == want
    keeps = sum(1 for m, k in want.values() if k)
    assert 0 < keeps < len(want)  # the filter is selective


def test_reorder_depth_brute(ray_session):
    out = entry._reorder_depth(SF).to_pandas()
    got = {
        r["user_id"]: (r["max_lateness_us"], r["n_late"])
        for _, r in out.iterrows()
    }
    from spatialindex_ray import ops

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["arrival"] = (
        ops._splitmix64(ev["event_id"].to_numpy()).view("int64")
    )
    want = {}
    for uid, g in ev.sort_values("arrival").groupby("user_id"):
        cm = g["ts_us"].cummax()
        late = cm - g["ts_us"]
        want[uid] = (int(late.max()), int((late > 0).sum()))
    assert got == want
    assert any(v[1] > 0 for v in want.values())  # out-of-orderness exists

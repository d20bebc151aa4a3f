"""Wave 93: SCD2 point-in-time lookup, lang confusion matrix — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_scd2_asof_brute(ray_session):
    out = entry._scd2_asof_lookup(SF).to_pandas()
    got = {r["user_id"]: (r["event_type"], r["version"]) for _, r in out.iterrows()}
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    ev["ts_us"] = ev["ts"].astype("int64")
    t_probe = (ev["ts_us"].min() + ev["ts_us"].max()) // 2
    want = {}
    for uid, g in ev.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        # run-compress, then find the run containing t_probe
        runs = []
        for ty, ts in zip(g["event_type"], g["ts_us"]):
            if not runs or runs[-1][0] != ty:
                runs.append([ty, ts])
        for v, (ty, ts) in enumerate(runs, 1):
            end = runs[v][1] if v < len(runs) else None
            if ts <= t_probe and (end is None or end > t_probe):
                want[uid] = (ty, v)
    assert got == want
    assert want  # probe time falls inside histories


def test_lang_confusion_brute(ray_session):
    from spatialindex_ray.functions.text import STOPWORDS

    out = entry._lang_confusion(SF).to_pandas()
    got = {(r["lang"], r["lang_pred"]): r["n"] for _, r in out.iterrows()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    langs = sorted(STOPWORDS)
    want = {}
    for _, r in docs.iterrows():
        toks = r["text"].split()
        scores = {lg: sum(1 for t in toks if t in STOPWORDS[lg]) for lg in langs}
        m = max(scores.values())
        pred = "und" if m == 0 else max(lg for lg in langs if scores[lg] == m)
        k = (r["lang"], pred)
        want[k] = want.get(k, 0) + 1
    assert got == want
    # matrix is complete and non-degenerate (the synthetic corpus text is
    # vocab-shared across langs, so off-diagonal mass is expected — the
    # report exists exactly to surface that)
    assert sum(want.values()) == len(docs)
    assert len(want) > 1

"""Wave 106: windowed stream-stream join, day-of-week profile — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_window_join_brute(ray_session):
    out = entry._click_purchase_window_join(SF).to_pandas()
    got = {
        r["user_id"]: (r["n_pairs"], r["n_clicks"], r["n_purchases"])
        for _, r in out.iterrows()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"])
    ev["t"] = ev["ts"].astype("int64")
    want = {}
    for uid, g in ev.groupby("user_id"):
        ct = g[g["event_type"] == "click"]["t"].to_numpy()
        pt = g[g["event_type"] == "purchase"]["t"].to_numpy()
        if len(ct) == 0 and len(pt) == 0:
            continue
        n = sum(
            int(((pt >= c) & (pt <= c + entry.STREAM_JOIN_W_US)).sum()) for c in ct
        )
        want[uid] = (n, len(ct), len(pt))
    assert got == want
    assert any(v[0] > 0 for v in want.values())


def test_dow_profile_brute(ray_session):
    out = entry._events_dow_profile(SF).to_pandas()
    got = {(r["dow"], r["event_type"]): r["n"] for _, r in out.iterrows()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    ev["dow"] = (ev["ts"].astype("int64") // 86_400_000_000 + 4) % 7
    want = ev.groupby(["dow", "event_type"]).size().to_dict()
    assert got == want
    # the 0=Sunday convention matches the real calendar: ours == (python
    # weekday + 1) % 7 for every event day
    d0 = pd.Timestamp(ev.iloc[0]["ts"])
    assert ev.iloc[0]["dow"] == (d0.to_pydatetime().weekday() + 1) % 7

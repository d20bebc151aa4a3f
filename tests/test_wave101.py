"""Wave 101: session funnel, first-touch attribution — brutes."""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def _ordered_events(sf):
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    ev["ts_us"] = ev["ts"].astype("int64")
    return ev.sort_values(["user_id", "ts_us", "event_id"])


def test_session_funnel_brute(ray_session):
    out = entry._events_session_funnel(SF).to_pandas()
    got = {
        r["user_id"]: (r["n_sessions"], r["n_funnel_sessions"])
        for _, r in out.iterrows()
    }
    ev = _ordered_events(SF)
    want = {}
    for uid, g in ev.groupby("user_id"):
        sessions = []
        cur = []
        prev = None
        for _, r in g.iterrows():
            if prev is not None and r["ts_us"] - prev > entry.FUNNEL_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(r["event_type"])
            prev = r["ts_us"]
        sessions.append(cur)
        nf = 0
        for sess in sessions:
            state = 0
            for t in sess:
                if state == 0 and t == "view":
                    state = 1
                elif state == 1 and t == "click":
                    state = 2
                elif state == 2 and t == "purchase":
                    state = 3
                    break
            nf += state == 3
        want[uid] = (len(sessions), nf)
    assert got == want
    assert any(v[1] > 0 for v in want.values())


def test_first_touch_brute(ray_session):
    out = entry._first_touch_attribution(SF).to_pandas()
    got = dict(zip(out["attr_type"], out["n_buys"]))
    ev = _ordered_events(SF)
    want = {}
    for uid, g in ev.groupby("user_id"):
        first = None
        first_pos = None
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.event_type != "purchase":
                first, first_pos = r.event_type, i
                break
        for i, r in enumerate(rows):
            if r.event_type == "purchase":
                ty = first if (first_pos is not None and first_pos < i) else "direct"
                want[ty] = want.get(ty, 0) + 1
    assert got == want

"""Wave 62: daily session bounce rate and top user paths — brute duals."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_session_bounce_brute(ray_session):
    out = entry._session_bounce_rate(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us"], kind="mergesort")
    want = {}
    for _, g in ev.groupby("user_id"):
        t = g["ts_us"].to_numpy()
        brk = np.ones(len(t), dtype=bool)
        brk[1:] = (t[1:] - t[:-1]) > entry.SESSION_GAP_US
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.concatenate([starts, [len(t)]]))
        for s, n in zip(t[starts], sizes):
            day = int(s // 86_400_000_000)
            a = want.setdefault(day, [0, 0])
            a[0] += 1
            a[1] += int(n == 1)
    got = out.set_index("day")
    assert len(got) == len(want)
    for day, (ns, nb) in want.items():
        assert int(got.loc[day, "n_sessions"]) == ns
        assert int(got.loc[day, "n_bounce"]) == nb
    assert (out["n_bounce"] <= out["n_sessions"]).all()


def test_top_paths_brute(ray_session):
    out = entry._top_paths(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    paths = ev.groupby("user_id")["event_type"].apply(lambda s: ">".join(s.head(5)))
    counts = paths.value_counts()
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: entry.TOP_PATHS_K]
    got = list(zip(out["path"], out["n_users"].astype(int)))
    assert got == ranked

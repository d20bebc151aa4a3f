"""Wave 99: KMV intersection estimate, lifecycle stages — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402

SF = "/root/testdata/sf0.01"  # enough users to exceed the sketch size


def test_kmv_intersection_brute(ray_session):
    row = entry._kmv_intersection(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    sets = {}
    for t in (entry.KMV_INTER_A, entry.KMV_INTER_B):
        uids = ev[ev["event_type"] == t]["user_id"].unique().astype(np.int64)
        hv = np.sort((ops._splitmix64(uids) >> np.uint64(1)).astype(np.int64))
        sets[t] = hv
    full = (1 << 63) - 1
    thetas = {
        t: int(h[entry.KMV_K - 1]) if len(h) >= entry.KMV_K else full
        for t, h in sets.items()
    }
    theta = min(thetas.values())
    ska = set(sets[entry.KMV_INTER_A][: entry.KMV_K].tolist())
    skb = set(sets[entry.KMV_INTER_B][: entry.KMV_K].tolist())
    common = {h for h in ska & skb if h < theta}
    assert row["theta"] == theta
    assert row["n_common"] == len(common)
    assert row["est_intersection"] == (len(common) * (1 << 63)) // theta
    # sanity: the estimate lands within 2x of the true intersection
    true = len(
        set(ev[ev["event_type"] == entry.KMV_INTER_A]["user_id"])
        & set(ev[ev["event_type"] == entry.KMV_INTER_B]["user_id"])
    )
    assert true / 2 <= row["est_intersection"] <= true * 2


def test_lifecycle_brute(ray_session):
    out = entry._user_lifecycle_stage(SF).to_pandas()
    got = {r["user_id"]: (r["n_periods"], r["stage"]) for _, r in out.iterrows()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["ts_us"] = ev["ts"].astype("int64")
    lo = ev["ts_us"].min()
    span = ev["ts_us"].max() - lo + 1
    ev["period"] = np.minimum((ev["ts_us"] - lo) * 4 // span, 3)
    want = {}
    for uid, g in ev.groupby("user_id"):
        act = set(g["period"])
        p4, p3, early = 3 in act, 2 in act, bool(act & {0, 1})
        if p4 and not p3 and not early:
            s = "new"
        elif p4 and p3:
            s = "retained"
        elif p4:
            s = "resurrected"
        else:
            s = "churned"
        want[uid] = (len(act), s)
    assert got == want

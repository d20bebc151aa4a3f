"""Wave 86: forward as-of, relational division, cone entry epoch — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_asof_fwd_brute(ray_session):
    out = entry._events_orders_asof_fwd(SF).to_pandas()
    got = dict(zip(out["o_orderkey"], out["event_id"]))
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    events = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    want = {}
    by_user = dict(tuple(events.groupby("user_id")))
    for _, o in orders.iterrows():
        ev = by_user.get(o["o_custkey"])
        if ev is None:
            continue
        cand = ev[ev["ts"] >= o["o_orderdate"]]
        if len(cand):
            tmin = cand["ts"].min()
            pick = cand[cand["ts"] == tmin]["event_id"].max()
            want[o["o_orderkey"]] = pick
    assert got == want
    assert want


def test_users_all_types_brute(ray_session):
    out = entry._users_all_types(SF).to_pandas()
    events = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    n_types = events["event_type"].nunique()
    hv = events[events["value"] >= entry.USERS_ALL_TYPES_MIN_VALUE]
    per_user = hv.groupby("user_id")["event_type"].nunique()
    want = set(per_user[per_user == n_types].index)
    assert set(out["user_id"]) == want
    assert 0 < len(want) < events["user_id"].nunique()  # selective


def test_cone_entry_epoch_brute(ray_session):
    from spatialindex_ray import geom, ops

    out = entry._cone_entry_epoch(SF).to_pandas()
    got = dict(zip(out["doc_id"], out["entry_epoch"]))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    lon, lat = ops.positions_from_id(ids)
    pm_lon = entry.PM_AMP * (2.0 * np.fmod(ids * entry.PM_C1, 1.0) - 1.0)
    pm_lat = entry.PM_AMP * (2.0 * np.fmod(ids * entry.PM_C2, 1.0) - 1.0)
    cfg = entry.CONE_EPOCH
    cone = geom.Cone(cfg["ra"], cfg["dec"], cfg["radius"])
    want = {}
    for t in range(entry.ENTRY_N_EPOCH, -1, -1):
        dt = t * entry.ENTRY_DT
        lon2 = np.fmod(lon + pm_lon * dt + 360.0, 360.0)
        lat2 = np.clip(lat + pm_lat * dt, -90.0, 90.0)
        v = ops.xyz_from_lonlat(lon2, lat2)
        inside = (
            v[:, 0] * cone.center[0]
            + v[:, 1] * cone.center[1]
            + v[:, 2] * cone.center[2]
            >= cone.cosrad
        )
        for d in ids[inside]:
            want[d] = t  # overwritten by smaller t as the loop descends
    assert got == want
    assert want

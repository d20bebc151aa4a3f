"""Wave 83: winnowing fingerprints, epoch-propagated cone search — brutes."""

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions import text as textfn  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_winnow_brute(ray_session):
    out = entry.queries()["winnow_fingerprints"](SF).to_pandas()
    got = set(zip(out["doc_id"], out["pos"], out["gram_hash"]))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    B, M = int(textfn._FP_BASE), 1 << 64
    K, W = textfn.WINNOW_K, textfn.WINNOW_W
    want = set()
    for did, s in zip(docs["doc_id"], docs["text"]):
        bs = s.encode()
        hs = []
        for i in range(len(bs) - K + 1):
            h = 0
            for ch in bs[i : i + K]:
                h = (h * B + ch) % M
            hs.append(h)
        for e in range(W - 1, len(hs)):
            winh = hs[e - W + 1 : e + 1]
            mn = min(winh)
            off = max(j for j in range(W) if winh[j] == mn)
            p = e - W + 1 + off
            hv = hs[p]
            want.add((did, p + 1, hv - M if hv >= 1 << 63 else hv))
    assert got == want


def test_winnow_guarantee(ray_session):
    # any shared substring of length >= K + W - 1 must share a fingerprint
    import pyarrow as pa

    K, W = textfn.WINNOW_K, textfn.WINNOW_W
    shared = "zqxjkvbwpfmzqxjkvyg"  # length 19 >= K + W - 1 = 11
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aaa " + shared + " bbbb", "cc" + shared + "ddddddd"]),
        }
    )
    out = textfn.winnow_batch(tbl).to_pandas()
    h0 = set(out[out.doc_id == 0]["gram_hash"])
    h1 = set(out[out.doc_id == 1]["gram_hash"])
    assert h0 & h1


def test_cone_epoch_brute(ray_session):
    out = entry.queries()["cone_search_epoch"](SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    from spatialindex_ray import geom, ops

    lon, lat = ops.positions_from_id(ids)
    pm_lon = entry.PM_AMP * (2.0 * np.fmod(ids * entry.PM_C1, 1.0) - 1.0)
    pm_lat = entry.PM_AMP * (2.0 * np.fmod(ids * entry.PM_C2, 1.0) - 1.0)
    lon2 = np.fmod(lon + pm_lon * entry.EPOCH_DT + 360.0, 360.0)
    lat2 = np.clip(lat + pm_lat * entry.EPOCH_DT, -90.0, 90.0)
    cfg = entry.CONE_EPOCH
    cone = geom.Cone(cfg["ra"], cfg["dec"], cfg["radius"])
    v = ops.xyz_from_lonlat(lon2, lat2)
    m = (
        v[:, 0] * cone.center[0] + v[:, 1] * cone.center[1] + v[:, 2] * cone.center[2]
        >= cone.cosrad
    )
    assert set(out["doc_id"]) == set(ids[m])
    # the pad bound really is a superset: every hit's epoch-0 position lies
    # within radius + 2*PM_AMP*DT of the center
    pad = 2.0 * entry.PM_AMP * entry.EPOCH_DT
    v0 = ops.xyz_from_lonlat(lon[m], lat[m])
    d0 = np.degrees(
        np.arccos(np.clip(v0 @ np.asarray(cone.center), -1.0, 1.0))
    )
    assert (d0 <= cfg["radius"] + pad + 1e-9).all()

"""Wave 91: multi-touch attribution, layout quality — brutes."""

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_multi_touch_brute(ray_session):
    out = entry._multi_touch_attribution(SF).to_pandas()
    got = dict(zip(out["attr_type"], out["credit_cents"]))
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["cents"] = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    want = {}
    total_purchase = 0
    for _, b in ev[ev["event_type"] == "purchase"].iterrows():
        total_purchase += b["cents"]
        t = ev[
            (ev["user_id"] == b["user_id"])
            & (ev["event_type"] != "purchase")
            & (
                (ev["ts_us"] < b["ts_us"])
                | ((ev["ts_us"] == b["ts_us"]) & (ev["event_id"] < b["event_id"]))
            )
        ].sort_values(["ts_us", "event_id"])
        c = int(b["cents"])
        k = len(t)
        if k == 0:
            want["direct"] = want.get("direct", 0) + c
            continue
        types = t["event_type"].tolist()
        if k == 1:
            credits = [c]
        elif k == 2:
            credits = [c // 2, c - c // 2]
        else:
            f = c * 4 // 10
            m = c * 2 // (10 * (k - 2))
            credits = [f] + [m] * (k - 2) + [c - f - m * (k - 2)]
        for ty, cr in zip(types, credits):
            want[ty] = want.get(ty, 0) + cr
    assert got == want
    # conservation: every purchase cent is credited somewhere
    assert sum(want.values()) == total_purchase


def test_layout_quality_brute(ray_session):
    from spatialindex_ray import ops

    out = entry._layout_quality(SF).set_index("layout")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    lon, lat = ops.positions_from_id(ids)
    nx = int(math.ceil(360.0 / entry.TILE_DEG))
    tile = (
        np.floor((lat + 90.0) / entry.TILE_DEG).astype(np.int64) * nx
        + np.floor(lon / entry.TILE_DEG).astype(np.int64)
    )
    B = entry.LAYOUT_BLOCK
    for layout, key in (
        ("natural", ids),
        ("tile_sorted", tile * (1 << 20) + ids),
    ):
        order = np.argsort(key)
        tl = tile[order]
        spans = []
        for s in range(0, len(tl), B):
            w = tl[s : s + B]
            spans.append(int(w.max() - w.min()))
        row = out.loc[layout]
        assert row["n_blocks"] == len(spans)
        assert row["total_span"] == sum(spans)
        assert row["max_span"] == max(spans)
    # the clustered layout must be dramatically better
    assert out.loc["tile_sorted", "total_span"] < out.loc["natural", "total_span"] / 5

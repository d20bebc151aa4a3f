"""Wave 65: time-weighted value integral per event type — brute dual."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_twap_by_type_brute(ray_session):
    out = entry._twap_by_type(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["cents"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    ev = ev.sort_values(["event_type", "ts_us", "event_id"], kind="mergesort")
    for t, g in ev.groupby("event_type"):
        ts = g["ts_us"].to_numpy()
        c = g["cents"].to_numpy()
        gap_s = (ts[1:] - ts[:-1]) // 1_000_000
        want_unit = int((c[:-1] * gap_s).sum())
        want_span = int(gap_s.sum())
        assert int(out.loc[t, "twap_unit"]) == want_unit
        assert int(out.loc[t, "span_s"]) == want_span
    # the implied TWAP lies within the value range (0..100 dollars)
    tw = out["twap_unit"].to_numpy() / np.maximum(out["span_s"].to_numpy(), 1)
    assert ((tw >= 0) & (tw <= 10000)).all()

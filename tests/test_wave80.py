"""Wave 80: Kadane max-subarray revenue window — brute."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_kadane_brute(ray_session):
    out = entry._kadane_revenue(SF).to_pandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    lo, hi = int(day.min()), int(day.max())
    cal = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(cal, day - lo, cents)
    base = int(cal.sum()) // len(cal)
    net = cal - base
    # O(n^2) brute over all windows
    best, best_end = None, None
    for j in range(len(net)):
        s = 0
        for i in range(j, -1, -1):
            s += int(net[i])
            if best is None or s > best:
                best, best_end = s, j
    assert int(out["best_sum"]) == best
    assert int(out["end_day"]) == lo + best_end
    assert int(out["baseline_cents"]) == base
    # a single best day is a lower bound for the best window
    assert best >= int(net.max())

"""Wave 95: interpolated quantiles, data-contract gate — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_quantiles_cont_brute(ray_session):
    out = (
        entry._events_quantiles_cont(SF)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for ty, g in ev.groupby("event_type"):
        a = np.sort(g["value"].to_numpy(dtype=np.float64))
        row = out.loc[ty]
        assert row["n_events"] == len(a)
        for q in entry.EVENT_QS:
            pos = (len(a) - 1) * q
            lo = int(np.floor(pos))
            frac = pos - lo
            hi = min(lo + 1, len(a) - 1)
            want = a[lo] * (1 - frac) + a[hi] * frac
            assert row[f"q{int(q * 100)}c"] == want
    # cont differs from disc somewhere (interpolation actually happens)
    disc = (
        entry._events_quantiles(SF).to_pandas().set_index("event_type").sort_index()
    )
    assert any(
        out.loc[t, "q25c"] != disc.loc[t, "q25"] for t in out.index
    )


def test_data_contract_brute(ray_session):
    out = entry._data_contract_report(SF).to_pandas().set_index("rule")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    cust = set(
        pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])["c_custkey"]
    )
    n = len(ev)
    want = {
        "value_range": int(
            ((ev["value"] < 0) | (ev["value"] > entry.CONTRACT_VALUE_CAP)).sum()
        ),
        "type_enum": int((~ev["event_type"].isin(entry.EVENT_TYPES)).sum()),
        "props_present": int(ev["props"].isna().sum()),
        "user_fk": int((~ev["user_id"].isin(cust)).sum()),
    }
    for rule, nv in want.items():
        assert out.loc[rule, "n_violations"] == nv
        assert out.loc[rule, "n_rows"] == n

"""Wave 60: group-disjoint split (leakage-safe) and Benford first-digit
audit — brute duals and the disjointness invariant."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_group_split_brute_and_disjoint(ray_session):
    out = entry._events_group_split(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    uid = ev["user_id"].to_numpy().astype(np.int64)
    pct = (ops._splitmix64(uid) % np.uint64(100)).astype(np.int64)
    split = np.where(
        pct < entry.GSPLIT_VAL_PCT,
        "val",
        np.where(pct < entry.GSPLIT_TEST_PCT, "test", "train"),
    )
    df = pd.DataFrame({"split": split, "user_id": uid})
    want_events = df.groupby("split").size()
    want_users = df.groupby("split")["user_id"].nunique()
    got = out.set_index("split")
    for s in want_events.index:
        assert int(got.loc[s, "n_events"]) == int(want_events[s])
        assert int(got.loc[s, "n_users"]) == int(want_users[s])
    # group-disjointness: every user maps to exactly one split
    assert df.groupby("user_id")["split"].nunique().max() == 1
    # totals conserve
    assert int(out["n_events"].sum()) == len(ev)


def test_benford_first_digit_brute(ray_session):
    out = entry._benford_first_digit(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    cents = cents[cents > 0]
    digits = np.array([int(str(c)[0]) for c in cents])
    want = pd.Series(digits).value_counts().sort_index()
    got = out.sort_values("digit").set_index("digit")["n"]
    assert got.astype(int).to_dict() == want.astype(int).to_dict()
    assert out["digit"].between(1, 9).all()
    assert int(out["n"].sum()) == len(cents)

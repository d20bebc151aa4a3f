"""Wave 66: Kendall components, 1-D EMD, Kaplan-Meier counts, hapax — brute duals."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_kendall_components_brute(ray_session):
    out = entry._kendall_tau_components(SF).to_pandas().iloc[0]
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=[entry.KT_X_COL, entry.KT_Y_COL]
    )
    x = np.round(li[entry.KT_X_COL].to_numpy() * 100).astype(np.int64)
    y = np.round(li[entry.KT_Y_COL].to_numpy()).astype(np.int64)
    n = len(x)
    # brute pair classification on the (small) sf0.001 table
    gx = x[None, :] > x[:, None]
    gy = y[None, :] > y[:, None]
    ex = x[None, :] == x[:, None]
    ey = y[None, :] == y[:, None]
    iu = np.triu_indices(n, k=1)

    def cnt(m):
        return int(m[iu].sum())

    conc = cnt((gx & gy) | (gx.T & gy.T))
    disc = cnt((gx & gy.T) | (gx.T & gy))
    tie_x = cnt(ex & ~ey)
    tie_y = cnt(ey & ~ex)
    tie_xy = cnt(ex & ey)
    assert int(out["concordant"]) == conc
    assert int(out["discordant"]) == disc
    assert int(out["tie_x"]) == tie_x
    assert int(out["tie_y"]) == tie_y
    assert int(out["tie_xy"]) == tie_xy
    assert int(out["n_rows"]) == n
    # every unordered pair lands in exactly one bucket
    assert conc + disc + tie_x + tie_y + tie_xy == n * (n - 1) // 2


def test_emd_types_brute(ray_session):
    out = entry._emd_types(SF).to_pandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    a = np.sort(
        np.round(
            ev.loc[ev.event_type == entry.EMD_TYPE_A, "value"].to_numpy() * 100
        ).astype(np.int64)
    )
    b = np.sort(
        np.round(
            ev.loc[ev.event_type == entry.EMD_TYPE_B, "value"].to_numpy() * 100
        ).astype(np.int64)
    )
    support = np.unique(np.concatenate([a, b]))
    cum_a = np.searchsorted(a, support, side="right")
    cum_b = np.searchsorted(b, support, side="right")
    gaps = np.diff(support)
    want = int(np.abs(cum_a[:-1] * len(b) - cum_b[:-1] * len(a)).dot(gaps))
    assert int(out["emd_scaled"]) == want
    assert int(out["n_a"]) == len(a)
    assert int(out["n_b"]) == len(b)
    # scaled integral of identical distributions is zero
    same = np.abs(cum_a[:-1] * len(a) - cum_a[:-1] * len(a)).sum()
    assert same == 0


def test_kaplan_meier_counts_brute(ray_session):
    out = entry._kaplan_meier_counts(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    us = ev["ts"].astype("int64")
    g = pd.DataFrame({"user_id": ev["user_id"], "us": us}).groupby("user_id")["us"]
    lo, hi = g.min(), g.max()
    horizon = int(us.max())
    dur = ((hi - lo) // 86_400_000_000).to_numpy()
    obs = ((horizon - hi) > entry.KM_CENSOR_DAYS * 86_400_000_000).to_numpy()
    for _, row in out.iterrows():
        d = int(row["duration_days"])
        assert int(row["n_at_risk"]) == int((dur >= d).sum())
        assert int(row["n_events"]) == int(((dur == d) & obs).sum())
        assert int(row["n_censored"]) == int(((dur == d) & ~obs).sum())
    # at-risk is non-increasing in duration and starts at the user count
    ar = out.sort_values("duration_days")["n_at_risk"].to_numpy()
    assert (np.diff(ar) <= 0).all()
    assert ar[0] == len(dur)


def test_hapax_ratio_brute(ray_session):
    out = entry._hapax_ratio(SF).to_pandas().set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
    for lg, grp in docs.groupby("lang"):
        counts = {}
        for tx in grp["text"]:
            for tok in tx.split():
                counts[tok] = counts.get(tok, 0) + 1
        assert int(out.loc[lg, "hapax"]) == sum(1 for v in counts.values() if v == 1)
        assert int(out.loc[lg, "types"]) == len(counts)
        assert int(out.loc[lg, "tokens"]) == sum(counts.values())
    # hapax <= types <= tokens
    assert (out["hapax"] <= out["types"]).all()
    assert (out["types"] <= out["tokens"]).all()

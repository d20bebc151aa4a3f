"""Wave 90: covariance accumulation, rolling median — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_embedding_cov_brute(ray_session):
    out = entry._embedding_cov(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding"])
    m = np.round(np.stack(emb["embedding"].to_numpy()) * entry.COV_SCALE).astype(
        np.int64
    )
    p = m.T @ m
    s = m.sum(axis=0)
    n = len(m)
    d = m.shape[1]
    assert len(out) == d * (d + 1) // 2
    for _, r in out.sample(50, random_state=0).iterrows():
        i, j = int(r["i"]), int(r["j"])
        assert i <= j
        assert r["sum_prod"] == p[i, j]
        assert r["sum_i"] == s[i] and r["sum_j"] == s[j]
        assert r["n"] == n
    # the reduced cells reconstruct the true covariance
    r0 = out[(out["i"] == 0) & (out["j"] == 1)].iloc[0]
    cov = (r0["sum_prod"] - r0["sum_i"] * r0["sum_j"] / n) / n
    want = np.cov(m[:, 0], m[:, 1], bias=True)[0, 1]
    assert abs(cov - want) / abs(want) < 1e-9


def test_rolling_median5_brute(ray_session):
    out = entry._rolling_median5(SF).to_pandas()
    got = dict(zip(out["event_id"], out["med_cents"]))
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    ev["cents"] = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    want = {}
    for _, g in ev.sort_values("event_id").groupby("user_id"):
        vals = []
        for eid, c in zip(g["event_id"], g["cents"]):
            vals.append(c)
            w = sorted(vals[-entry.ROLLMED_W :])
            want[eid] = w[(len(w) - 1) // 2]
    assert got == want
    assert len(got) == len(ev)

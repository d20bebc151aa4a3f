"""Wave 56: connected components (bounded Hash-Min label propagation) and
exact-integer truncated EWMA — brute-force duals and fixed-point checks."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from tests.test_wave55 import _transition_edges  # noqa: E402

SF = "/root/testdata/sf0.001"


def _hashmin(edges, rounds):
    nodes = {n for e in edges for n in e}
    label = {n: n for n in nodes}
    for _ in range(rounds):
        new = dict(label)
        for u, v in edges:
            m = min(label[u], label[v])
            new[u] = min(new[u], m)
            new[v] = min(new[v], m)
        label = new
    return label


def test_connected_components_matches_brute(ray_session):
    out = entry._connected_components(SF).to_pandas()
    want = _hashmin(_transition_edges(), entry.CC_ROUNDS)
    got = dict(zip(out["user_id"].astype(int), out["component"].astype(int)))
    assert got == want


def test_cc_reaches_fixed_point():
    edges = _transition_edges()
    a = _hashmin(edges, entry.CC_ROUNDS)
    b = _hashmin(edges, entry.CC_ROUNDS + 1)
    assert a == b  # CC_ROUNDS covers the diameter at test scale


def test_ewma_trend_brute(ray_session):
    out = entry._ewma_trend(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"])
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    want = {}
    for _, g in ev.groupby("user_id"):
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        eids = g["event_id"].to_numpy()
        for i in range(len(g)):
            s = 0
            for k in range(entry.EWMA_W):
                if i - k < 0:
                    break
                s += (1 << (entry.EWMA_W - 1 - k)) * int(cents[i - k])
            want[int(eids[i])] = s
    got = dict(zip(out["event_id"].astype(int), out["ewma_unit"].astype(int)))
    assert got == want
    # the first event of each user carries exactly 2^(W-1) * its own cents
    firsts = ev.groupby("user_id").head(1)
    for eid, v in zip(firsts["event_id"], np.round(firsts["value"].to_numpy() * 100).astype(np.int64)):
        assert got[int(eid)] == (1 << (entry.EWMA_W - 1)) * int(v)

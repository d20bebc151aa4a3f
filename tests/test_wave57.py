"""Wave 57: exact ROC-AUC (midrank Mann-Whitney) and calibration bins —
brute-force duals against scipy-free numpy recomputes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def _scores():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding", "label"])
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    sc = np.round(m[:, 0] * entry.AUC_SCALE).astype(np.int64)
    pos = (emb["label"].to_numpy().astype(np.int64) % 2).astype(np.int64)
    return sc, pos


def test_roc_auc_matches_midrank_brute(ray_session):
    out = entry._roc_auc(SF)
    sc, pos = _scores()
    order = np.argsort(sc, kind="stable")
    ss, pp = sc[order], pos[order]
    # midranks with ties (1-based)
    ranks = np.empty(len(ss), dtype=np.float64)
    i = 0
    while i < len(ss):
        j = i
        while j < len(ss) and ss[j] == ss[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        i = j
    P = int(pp.sum())
    N = len(pp) - P
    r_pos = ranks[pp == 1].sum()
    auc = (r_pos - P * (P + 1) / 2) / (P * N)
    num, den = int(out["auc_num"].iloc[0]), int(out["auc_den"].iloc[0])
    assert abs(num / den - auc) < 1e-12
    assert int(out["n_pos"].iloc[0]) == P
    assert int(out["n_neg"].iloc[0]) == N
    assert int(out["auc_milli"].iloc[0]) == num * 1000 // den
    assert 0 <= num <= den


def test_calibration_bins_brute(ray_session):
    out = entry._calibration_bins(SF).to_pandas()
    sc, pos = _scores()
    mn, mx = int(sc.min()), int(sc.max())
    b = (sc - mn) * entry.CALIB_BINS // (mx - mn + 1)
    want_n = pd.Series(b).value_counts().sort_index()
    want_pos = pd.Series(b[pos == 1]).value_counts().sort_index()
    got = out.sort_values("bin").set_index("bin")
    assert got["n"].astype(int).to_dict() == want_n.astype(int).to_dict()
    for bin_id, npos in want_pos.items():
        assert int(got.loc[bin_id, "n_pos"]) == int(npos)
    assert int(out["n"].sum()) == len(sc)
    assert out["bin"].between(0, entry.CALIB_BINS - 1).all()

"""Wave 73: grouped Spearman, Poisson bootstrap, Theil-Sen — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


def _dr2(v):
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v), dtype=np.float64)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    return np.round(ranks * 2).astype(np.int64)


def test_spearman_by_flag_brute(ray_session):
    out = entry._spearman_by_flag(SF).to_pandas().set_index("flag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", entry.KT_X_COL, entry.KT_Y_COL],
    )
    for flag, grp in li.groupby("l_returnflag"):
        x = np.round(grp[entry.KT_X_COL].to_numpy() * 100).astype(np.int64)
        y = np.round(grp[entry.KT_Y_COL].to_numpy()).astype(np.int64)
        rx, ry = _dr2(x), _dr2(y)
        assert int(out.loc[flag, "n_rows"]) == len(x)
        assert int(out.loc[flag, "sum_rx"]) == int(rx.sum())
        assert int(out.loc[flag, "sum_rxy"]) == int((rx * ry).sum())
        assert int(out.loc[flag, "sum_rx2"]) == int((rx * rx).sum())
        assert int(out.loc[flag, "sum_ry2"]) == int((ry * ry).sum())


def test_poisson_bootstrap_brute(ray_session):
    out = entry._poisson_bootstrap(SF).to_pandas().set_index("replicate")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    ids = ev["event_id"].to_numpy().astype(np.int64)
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    cuts = np.array(entry.BOOT_CUTS, dtype=np.int64)
    for b in range(entry.BOOT_B):
        u = (
            ops._splitmix64(ids * entry.BOOT_B + b).astype(np.uint64)
            % np.uint64(10000)
        ).astype(np.int64)
        w = np.searchsorted(cuts, u, side="right")
        assert int(out.loc[b, "sum_cents"]) == int((w * cents).sum())
        assert int(out.loc[b, "n_weighted"]) == int(w.sum())
    # weights average near 1: weighted counts cluster around n
    assert abs(out["n_weighted"].mean() - len(ids)) < 0.2 * len(ids)


def test_theil_sen_brute(ray_session):
    out = entry._theil_sen_daily(SF).to_pandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    d, y = np.unique(day, return_counts=True)
    y = y.astype(np.int64)
    from fractions import Fraction

    slopes = []
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            slopes.append(Fraction(int(y[j] - y[i]), int(d[j] - d[i])))
    slopes.sort()
    med = slopes[(len(slopes) - 1) // 2]
    assert int(out["n_pairs"]) == len(slopes)
    assert int(out["slope_num"]) == med.numerator
    assert int(out["slope_den"]) == med.denominator

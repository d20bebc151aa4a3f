"""Wave 69: Spearman midranks, source novelty, activity streaks — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_spearman_components_brute(ray_session):
    out = entry._spearman_components(SF).to_pandas().iloc[0]
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=[entry.KT_X_COL, entry.KT_Y_COL]
    )
    x = np.round(li[entry.KT_X_COL].to_numpy() * 100).astype(np.int64)
    y = np.round(li[entry.KT_Y_COL].to_numpy()).astype(np.int64)

    def dr2(v):
        # double-midranks via scipy-free average rank * 2
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
            i = j
        r2 = np.round(ranks * 2).astype(np.int64)
        return r2

    rx, ry = dr2(x), dr2(y)
    assert int(out["n_rows"]) == len(x)
    assert int(out["sum_rx"]) == int(rx.sum())
    assert int(out["sum_ry"]) == int(ry.sum())
    assert int(out["sum_rx2"]) == int((rx * rx).sum())
    assert int(out["sum_ry2"]) == int((ry * ry).sum())
    assert int(out["sum_rxy"]) == int((rx * ry).sum())
    # implied rho must be a valid correlation
    n = len(x)
    num = n * int((rx * ry).sum()) - int(rx.sum()) * int(ry.sum())
    dx = n * int((rx * rx).sum()) - int(rx.sum()) ** 2
    dy = n * int((ry * ry).sum()) - int(ry.sum()) ** 2
    rho = num / float(dx * dy) ** 0.5
    assert -1.0 <= rho <= 1.0


def test_source_novelty_brute(ray_session):
    out = (
        entry._source_novelty(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    ).sort_values(["source", "doc_id"])
    want = []
    prev = {}
    for r in docs.itertuples(index=False):
        toks = set(r.text.split())
        if r.source in prev:
            pid, ptoks = prev[r.source]
            inter = len(toks & ptoks)
            want.append((r.doc_id, pid, inter, len(toks) + len(ptoks) - inter))
        prev[r.source] = (r.doc_id, toks)
    wdf = (
        pd.DataFrame(want, columns=["doc_id", "prev_doc_id", "inter", "uni"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.astype("int64").equals(wdf.astype("int64"))


def test_longest_streak_brute(ray_session):
    out = entry._longest_streak(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    day = ev["ts"].astype("int64") // 86_400_000_000
    for uid, grp in pd.DataFrame({"u": ev["user_id"], "d": day}).groupby("u"):
        days = np.unique(grp["d"].to_numpy())
        runs = np.split(days, np.flatnonzero(np.diff(days) != 1) + 1)
        assert int(out.loc[uid, "n_active_days"]) == len(days)
        assert int(out.loc[uid, "longest_streak"]) == max(len(r) for r in runs)

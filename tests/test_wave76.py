"""Wave 76: sliding-window distinct users, embedding 1-NN eval — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_window_distinct_users_brute(ray_session):
    out = entry._window_distinct_users(SF).to_pandas().set_index("day")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    uid = ev["user_id"].to_numpy()
    lo, hi = int(day.min()), int(day.max())
    for d in range(lo, hi + 1):
        m = (day >= d - entry.WDU_WINDOW + 1) & (day <= d)
        want = len(set(uid[m].tolist()))
        if want:
            assert int(out.loc[d, "n_distinct_7d"]) == want
        else:
            assert d not in out.index
    # window count >= single-day distinct count
    single = pd.DataFrame({"u": uid, "d": day}).groupby("d")["u"].nunique()
    for d in single.index:
        assert int(out.loc[d, "n_distinct_7d"]) >= int(single.loc[d])


def test_embedding_1nn_eval_brute(ray_session):
    out = entry._embedding_1nn_eval(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    m = np.round(
        np.stack(emb["embedding"].to_numpy()) * entry.NN_EVAL_SCALE
    ).astype(np.int64)
    lab = emb["label"].to_numpy().astype(np.int64)
    conf = {}
    for qpos in np.flatnonzero(ids < entry.NN_EVAL_QUERIES):
        diff = m - m[qpos][None, :]
        d2 = (diff * diff).sum(axis=1)
        d2[ids == ids[qpos]] = np.iinfo(np.int64).max
        mn = d2.min()
        cand = np.flatnonzero(d2 == mn)
        pick = cand[np.argmin(ids[cand])]
        key = (int(lab[qpos]), int(lab[pick]))
        conf[key] = conf.get(key, 0) + 1
    got = {
        (int(r.query_label), int(r.nn_label)): int(r.n)
        for r in out.itertuples(index=False)
    }
    assert got == conf

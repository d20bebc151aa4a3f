"""Wave 89: t-closeness EMD profile, triplet mining — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_t_closeness_brute(ray_session):
    out = entry._t_closeness(SF).to_pandas()
    got = {
        (r["lang"], r["source"]): (r["n"], r["emd_scaled"])
        for _, r in out.iterrows()
    }
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    docs["band"] = docs["n_chars"] // entry.LDIV_BAND
    bands = np.array(sorted(docs["band"].unique()))
    tot = docs.groupby("band").size().reindex(bands, fill_value=0).to_numpy()
    cum_all = np.cumsum(tot)
    n_total = len(docs)
    want = {}
    for (lang, src), g in docs.groupby(["lang", "source"]):
        cnt = g.groupby("band").size().reindex(bands, fill_value=0).to_numpy()
        cg = np.cumsum(cnt)
        gs = len(g)
        emd = int(np.abs(n_total * cg - gs * cum_all).sum())
        want[(lang, src)] = (gs, emd)
    assert got == want
    # groups with the global mix have small distance; skewed ones larger
    assert max(v[1] for v in want.values()) > 0


def test_triplet_mining_brute(ray_session):
    out = entry._triplet_mining(SF).to_pandas().set_index("anchor_id").sort_index()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.round(np.stack(emb["embedding"].to_numpy()) * entry.NN_EVAL_SCALE).astype(
        np.int64
    )
    ids = emb["vec_id"].to_numpy()
    lab = emb["label"].to_numpy()
    n_neg_margin = 0
    for a in range(entry.NN_EVAL_QUERIES):
        ai = np.flatnonzero(ids == a)[0]
        diff = m[ai][None, :] - m
        d2 = (diff * diff).sum(axis=1)
        pos_mask = (lab == lab[ai]) & (ids != a)
        neg_mask = lab != lab[ai]
        if not pos_mask.any() or not neg_mask.any():
            assert a not in out.index
            continue
        dp = d2[pos_mask].min()
        pid = ids[pos_mask][d2[pos_mask] == dp].min()
        dn = d2[neg_mask].min()
        nid = ids[neg_mask][d2[neg_mask] == dn].min()
        row = out.loc[a]
        assert (row["pos_id"], row["neg_id"]) == (pid, nid)
        assert (row["d2_pos"], row["d2_neg"]) == (dp, dn)
        assert row["margin"] == dn - dp
        n_neg_margin += int(dn < dp)
    assert len(out) == entry.NN_EVAL_QUERIES

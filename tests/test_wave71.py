"""Wave 71: HITS scores, vocabulary growth, reciprocal-rank fusion."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_hits_brute(ray_session):
    out = entry._hits_scores(SF).to_pandas().set_index("source")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    smap = docs.set_index("doc_id")["source"].to_dict()
    edges = {
        (r.user_id, smap[int(r.event_id) % 500])
        for r in ev.itertuples(index=False)
        if int(r.event_id) % 500 in smap
    }
    a1: dict = {}
    for _, s in edges:
        a1[s] = a1.get(s, 0) + 1
    h1: dict = {}
    for u, s in edges:
        h1[u] = h1.get(u, 0) + a1[s]
    a2: dict = {}
    for u, s in edges:
        a2[s] = a2.get(s, 0) + h1[u]
    for s in a1:
        assert int(out.loc[s, "a1"]) == a1[s]
        assert int(out.loc[s, "a2"]) == a2[s]
    assert len(out) == len(a1)


def test_vocab_growth_brute(ray_session):
    out = entry._vocab_growth(SF).to_pandas().set_index("checkpoint")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id")
    seen: set = set()
    sizes = {}
    cps = sorted(out.index)
    ci = 0
    for r in docs.itertuples(index=False):
        while ci < len(cps) and r.doc_id >= cps[ci]:
            sizes[cps[ci]] = len(seen)
            ci += 1
        seen.update(r.text.split())
    while ci < len(cps):
        sizes[cps[ci]] = len(seen)
        ci += 1
    for cp in cps:
        assert int(out.loc[cp, "vocab_size"]) == sizes[cp]
    # growth curve is non-decreasing
    assert (np.diff(out.sort_index()["vocab_size"].to_numpy()) >= 0).all()


def test_rrf_fusion_brute(ray_session):
    out = entry._rrf_fusion(SF).to_pandas().set_index("doc_id").sort_index()
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    docs["n_distinct"] = docs["text"].map(lambda t: len(set(t.split())))
    r_len = (
        docs.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
        .assign(rank=lambda d: np.arange(1, len(d) + 1))
        .set_index("doc_id")["rank"]
    )
    r_rich = (
        docs.sort_values(["n_distinct", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
        .assign(rank=lambda d: np.arange(1, len(d) + 1))
        .set_index("doc_id")["rank"]
    )
    for did in docs["doc_id"]:
        ra, rb = int(r_len.loc[did]), int(r_rich.loc[did])
        assert int(out.loc[did, "rank_len"]) == ra
        assert int(out.loc[did, "rank_rich"]) == rb
        want = entry.RRF_SCALE // (entry.RRF_K + ra) + entry.RRF_SCALE // (
            entry.RRF_K + rb
        )
        assert int(out.loc[did, "rrf_scaled"]) == want

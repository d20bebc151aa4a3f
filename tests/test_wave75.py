"""Wave 75: top TF-IDF keyword, neighbor-degree assortativity — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_doc_top_tfidf_brute(ray_session):
    out = entry._doc_top_tfidf(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n = len(docs)
    tf = {}
    dfreq = {}
    for r in docs.itertuples(index=False):
        c = {}
        for t in r.text.split():
            c[t] = c.get(t, 0) + 1
        tf[r.doc_id] = c
        for t in c:
            dfreq[t] = dfreq.get(t, 0) + 1
    for did, c in tf.items():
        best = None
        for t, f in c.items():
            s = f * ((n * entry.TFIDF_KW_SCALE) // dfreq[t])
            k = (-s, t)
            if best is None or k < best:
                best = k
        assert out.loc[did, "top_term"] == best[1]
        assert int(out.loc[did, "score"]) == -best[0]
    assert len(out) == len(tf)


def test_avg_neighbor_degree_brute(ray_session):
    out = entry._avg_neighbor_degree(SF).to_pandas().set_index("node")
    from spatialindex_ray.functions import dedup

    pairs = dedup.ngram_jaccard_query(SF).to_pandas()
    adj = {}
    for r in pairs.itertuples(index=False):
        adj.setdefault(int(r.left_id), []).append(int(r.right_id))
        adj.setdefault(int(r.right_id), []).append(int(r.left_id))
    for node, nbrs in adj.items():
        assert int(out.loc[node, "deg"]) == len(nbrs)
        assert int(out.loc[node, "nbr_deg_sum"]) == sum(
            len(adj[x]) for x in nbrs
        )
    assert len(out) == len(adj)

"""Wave 78: two-hop reach, l-diversity — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_two_hop_reach_brute(ray_session):
    out = entry._two_hop_reach(SF).to_pandas().set_index("node")
    from spatialindex_ray.functions import dedup

    pairs = dedup.ngram_jaccard_query(SF).to_pandas()
    adj = {}
    for r in pairs.itertuples(index=False):
        adj.setdefault(int(r.left_id), set()).add(int(r.right_id))
        adj.setdefault(int(r.right_id), set()).add(int(r.left_id))
    for node, nbrs in adj.items():
        reach = set(nbrs)
        for x in nbrs:
            reach |= adj[x]
        reach.discard(node)
        assert int(out.loc[node, "n_reach2"]) == len(reach)
    assert len(out) == len(adj)


def test_l_diversity_brute(ray_session):
    out = (
        entry._l_diversity(SF)
        .to_pandas()
        .set_index(["lang", "source"])
        .sort_index()
    )
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    docs["band"] = docs["n_chars"].astype("int64") // entry.LDIV_BAND
    for (lg, src), grp in docs.groupby(["lang", "source"]):
        assert int(out.loc[(lg, src), "n_rows"]) == len(grp)
        assert int(out.loc[(lg, src), "n_distinct_bands"]) == grp[
            "band"
        ].nunique()
    assert len(out) == docs.groupby(["lang", "source"]).ngroups

"""Wave 79: ranking overlap curve, dedup impact — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_ranking_overlap_brute(ray_session):
    out = entry._ranking_overlap_curve(SF).to_pandas().set_index("depth")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    docs["n_distinct"] = docs["text"].map(lambda t: len(set(t.split())))
    by_len = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    )["doc_id"].tolist()
    by_rich = docs.sort_values(
        ["n_distinct", "doc_id"], ascending=[False, True]
    )["doc_id"].tolist()
    for d in entry.ROC_DEPTHS:
        want = len(set(by_len[:d]) & set(by_rich[:d]))
        assert int(out.loc[d, "overlap"]) == want
    # overlap@d is within [0, d] and non-decreasing
    ov = out.sort_index()["overlap"].to_numpy()
    assert (ov <= np.array(entry.ROC_DEPTHS)).all()
    assert (np.diff(ov) >= 0).all()


def test_dedup_impact_brute(ray_session):
    out = entry._dedup_impact_by_lang(SF).to_pandas().set_index("lang")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    docs["ntok"] = docs["text"].map(lambda t: len(t.split()))
    for lg, grp in docs.groupby("lang"):
        g = grp.groupby("text")
        assert int(out.loc[lg, "n_docs"]) == len(grp)
        assert int(out.loc[lg, "n_docs_after"]) == g.ngroups
        assert int(out.loc[lg, "tokens"]) == int(grp["ntok"].sum())
        assert int(out.loc[lg, "tokens_after"]) == int(
            g["ntok"].first().sum()
        )
    # dedup never grows the corpus
    assert (out["n_docs_after"] <= out["n_docs"]).all()
    assert (out["tokens_after"] <= out["tokens"]).all()

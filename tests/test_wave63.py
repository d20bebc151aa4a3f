"""Wave 63: language purity and entity-extraction counts — brute duals."""

import re
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions.text import STOPWORDS  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_lang_purity_brute(ray_session):
    out = entry._lang_purity(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(docs["doc_id"].head(100), docs["text"].head(100)):
        toks = text.split()
        votes = {
            lang: sum(1 for t in toks if t in STOPWORDS[lang]) for lang in STOPWORDS
        }
        top, total = max(votes.values()), sum(votes.values())
        assert int(out.loc[did, "votes_top"]) == top
        assert int(out.loc[did, "votes_total"]) == total
        want = 100 * top // total if total > 0 else 0
        assert int(out.loc[did, "purity_pct"]) == want
    assert (out["votes_top"] <= out["votes_total"]).all()
    assert out["purity_pct"].between(0, 100).all()


def test_doc_entity_counts_brute(ray_session):
    out = entry._doc_entity_counts(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    em = re.compile(entry.ENTITY_EMAIL_RE)
    ur = re.compile(entry.ENTITY_URL_RE)
    for did, text in zip(docs["doc_id"].head(200), docs["text"].head(200)):
        assert int(out.loc[did, "n_emails"]) == len(em.findall(text))
        assert int(out.loc[did, "n_urls"]) == len(ur.findall(text))
    assert len(out) == len(docs)

"""Wave 64: greedy max-coverage document selection over bigrams —
brute greedy dual with tie-breaks."""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def _bigrams(text):
    w = text.split()
    return {f"{a} {b}" for a, b in zip(w, w[1:])}


def test_greedy_coverage_brute(ray_session):
    out = entry._greedy_coverage_docs(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sets = {int(d): _bigrams(t) for d, t in zip(docs["doc_id"], docs["text"])}
    covered = set()
    want = []
    for rank in range(1, entry.GREEDY_K + 1):
        best_doc, best_n = None, 0
        for d in sorted(sets):
            n = len(sets[d] - covered)
            if n > best_n:
                best_doc, best_n = d, n
        if best_doc is None:
            break
        want.append((rank, best_doc, best_n))
        covered |= sets[best_doc]
    got = [tuple(map(int, r)) for r in out.itertuples(index=False)]
    assert got == want
    # marginal gains are non-increasing (submodularity of coverage)
    gains = [g for _, _, g in got]
    assert all(a >= b for a, b in zip(gains, gains[1:]))

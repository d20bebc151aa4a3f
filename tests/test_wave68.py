"""Wave 68: isotonic calibration, bigram surprisal, vocab overlap — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_isotonic_minimax_equivalence(ray_session):
    out = entry._isotonic_calibration(SF).to_pandas().sort_values("bin")
    n = out["n"].to_numpy().astype(np.int64)
    npos = out["n_pos"].to_numpy().astype(np.int64)
    # brute minimax over present bins with exact fractions, floored to ppm
    B = len(n)
    pn = np.concatenate([[0], np.cumsum(n)])
    pp = np.concatenate([[0], np.cumsum(npos)])
    want = np.empty(B, dtype=np.int64)
    for i in range(B):
        best = -(10**18)
        for j in range(i + 1):
            worst = 10**18
            for k in range(i, B):
                num = int(pp[k + 1] - pp[j])
                den = int(pn[k + 1] - pn[j])
                worst = min(worst, (num * entry.ISO_SCALE) // den)
            best = max(best, worst)
        want[i] = best
    assert (out["iso_ppm"].to_numpy() == want).all()
    # isotonic: non-decreasing
    assert (np.diff(out["iso_ppm"].to_numpy()) >= 0).all()
    # fit bounded by the observed rate range
    rate_ppm = (npos * entry.ISO_SCALE) // n
    assert out["iso_ppm"].min() >= rate_ppm.min()
    assert out["iso_ppm"].max() <= rate_ppm.max()


def test_bigram_surprisal_brute(ray_session):
    out = (
        entry._bigram_surprisal(SF).to_pandas().set_index("doc_id").sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    c1: dict = {}
    c2: dict = {}
    doc_bgs = {}
    for r in docs.itertuples(index=False):
        toks = r.text.split()
        for t in toks:
            c1[t] = c1.get(t, 0) + 1
        bgs = list(zip(toks[:-1], toks[1:]))
        doc_bgs[r.doc_id] = bgs
        for b in bgs:
            c2[b] = c2.get(b, 0) + 1
    for did, bgs in doc_bgs.items():
        if not bgs:
            assert did not in out.index
            continue
        tot = sum((c1[w1] * entry.BIGRAM_SCALE) // c2[(w1, w2)] for w1, w2 in bgs)
        assert int(out.loc[did, "n_bigrams"]) == len(bgs)
        assert int(out.loc[did, "surprisal_scaled"]) == tot // len(bgs)


def test_lang_vocab_overlap_brute(ray_session):
    out = entry._lang_vocab_overlap(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
    vocab: dict = {}
    for r in docs.itertuples(index=False):
        vocab.setdefault(r.lang, set()).update(r.text.split())
    langs = sorted(vocab)
    want = {}
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                want[(a, b)] = (inter, len(vocab[a]), len(vocab[b]))
    got = {
        (r.lang_a, r.lang_b): (int(r.inter), int(r.size_a), int(r.size_b))
        for r in out.itertuples(index=False)
    }
    assert got == want

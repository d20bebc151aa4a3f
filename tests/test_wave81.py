"""Wave 81: Gopher quality flags, skipgram pairs, session overlap — brutes."""

import sys
from collections import Counter
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_gopher_flags_brute(ray_session):
    out = (
        entry._gopher_quality_flags(SF)
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
    rows = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = text.split()
        words = len(toks)
        sum_len = sum(len(t) for t in toks)
        stop = sum(1 for t in toks if t in ("the", "a"))
        maxcnt = max(Counter(toks).values()) if toks else 0
        r1 = words >= 30
        r2 = words > 0 and 3 * words <= sum_len <= 6 * words
        r3 = words > 0 and 20 * stop >= words
        r4 = words > 0 and 5 * maxcnt <= words
        acc = rows.setdefault(lang, np.zeros(6, dtype=np.int64))
        acc += np.array(
            [1, r1, r2, r3, r4, r1 and r2 and r3 and r4], dtype=np.int64
        )
    for lang, acc in rows.items():
        got = out.loc[lang]
        assert got["n_docs"] == acc[0]
        assert got["pass_words"] == acc[1]
        assert got["pass_meanlen"] == acc[2]
        assert got["pass_stopword"] == acc[3]
        assert got["pass_dominance"] == acc[4]
        assert got["pass_all"] == acc[5]
    assert set(out.index) == set(rows)


def test_skipgram_pairs_brute(ray_session):
    out = entry._skipgram_pairs(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs[docs["doc_id"] < entry.SKIPGRAM_DOC_BOUND]
    w = Counter()
    n = Counter()
    for text in docs["text"]:
        toks = text.split()
        for dist, wt in ((1, 2), (2, 1)):
            for i in range(len(toks) - dist):
                w[(toks[i], toks[i + dist])] += wt
                n[(toks[i], toks[i + dist])] += 1
    want = sorted(
        ((-wt, w1, w2) for (w1, w2), wt in w.items())
    )[:30]
    got = list(
        zip(-out["weight_sum"].to_numpy(), out["w1"], out["w2"])
    )
    assert got == want
    for _, w1, w2 in want:
        row = out[(out["w1"] == w1) & (out["w2"] == w2)].iloc[0]
        assert int(row["n_pairs"]) == n[(w1, w2)]


def test_session_overlap_brute(ray_session):
    out = (
        entry._session_overlap_types(SF)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    ev = ev[ev["event_type"].isin(["click", "view"])]
    ev["ts_us"] = ev["ts"].astype("int64")
    pairs = {}
    for (uid, _typ), grp in ev.groupby(["user_id", "event_type"]):
        t = np.sort(grp["ts_us"].to_numpy())
        brk = np.flatnonzero(np.diff(t) > entry.SESSION_GAP_US) + 1
        segs = np.split(t, brk)
        ivs = [
            (s[0] - entry.SESSION_PAD_US, s[-1] + entry.SESSION_PAD_US)
            for s in segs
        ]
        pairs.setdefault(uid, {})[_typ] = ivs
    expect = {}
    for uid, sides in pairs.items():
        tot, cnt = 0, 0
        for sa, ea in sides.get("click", []):
            for sb, eb in sides.get("view", []):
                if sa < eb and sb < ea:
                    cnt += 1
                    tot += min(ea, eb) - max(sa, sb)
        if cnt:
            expect[uid] = (cnt, tot)
    assert set(out.index) == set(expect)
    for uid, (cnt, tot) in expect.items():
        assert int(out.loc[uid, "n_overlap_pairs"]) == cnt
        assert int(out.loc[uid, "overlap_us"]) == tot

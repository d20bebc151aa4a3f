"""Wave 96: winnow top-similar, type cosine components — brutes."""

import sys
from collections import Counter, defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from tests.test_wave84 import _brute_fingerprints  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_winnow_top_similar_brute(ray_session):
    out = entry._winnow_top_similar(SF).to_pandas()
    got = {
        (r["doc_id"], r["rank"]): (r["neighbor"], r["shared"])
        for _, r in out.iterrows()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sets = _brute_fingerprints(docs)
    dfreq = Counter(h for s in sets.values() for h in s)
    filt = {
        d: {h for h in s if dfreq[h] <= entry.WINNOW_DF_CAP}
        for d, s in sets.items()
    }
    ids = sorted(filt)
    nb = defaultdict(list)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sh = len(filt[a] & filt[b])
            if sh >= 1:
                nb[a].append((-sh, b))
                nb[b].append((-sh, a))
    want = {}
    for d, lst in nb.items():
        lst.sort()
        for rk, (negsh, n) in enumerate(lst[: entry.WINNOW_TOP_N], 1):
            want[(d, rk)] = (n, -negsh)
    assert got == want


def test_type_cosine_brute(ray_session):
    out = entry._type_cosine_components(SF).to_pandas()
    got = {(r["type_a"], r["type_b"]): r["dot"] for _, r in out.iterrows()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    c = ev.groupby(["user_id", "event_type"]).size().unstack(fill_value=0)
    types = sorted(entry.EVENT_TYPES)
    m = c.reindex(columns=types, fill_value=0).to_numpy(dtype=np.int64)
    p = m.T @ m
    want = {
        (types[i], types[j]): int(p[i, j])
        for i in range(len(types))
        for j in range(i, len(types))
    }
    assert got == want
    assert len(got) == len(types) * (len(types) + 1) // 2

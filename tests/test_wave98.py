"""Wave 98: content-defined chunking, churn labels — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions import text as textfn  # noqa: E402

SF = "/root/testdata/sf0.001"


def _horner(bs: bytes) -> int:
    B, M = int(textfn._FP_BASE), 1 << 64
    h = 0
    for ch in bs:
        h = (h * B + ch) % M
    return h


def test_cdc_chunks_brute(ray_session):
    out = textfn.cdc_chunks_query(SF).to_pandas()
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start"], r["length"], r["chunk_hash"])
        for _, r in out.iterrows()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    K, MASK, M = textfn.CDC_K, textfn.CDC_MASK, 1 << 64
    want = {}
    for did, s in zip(docs["doc_id"], docs["text"]):
        bs = s.encode()
        if not bs:
            continue
        cuts = []
        for p in range(len(bs) - K + 1):
            if _horner(bs[p : p + K]) % (MASK + 1) == 0:
                e = p + K
                if e < len(bs):
                    cuts.append(e)
        bounds = [0] + cuts + [len(bs)]
        for ci, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
            hv = _horner(bs[a:b])
            want[(did, ci)] = (a, b - a, hv - M if hv >= 1 << 63 else hv)
    assert got == want
    # boundaries are content-defined: shifting a doc by a prefix reproduces
    # the same interior cut content
    import pyarrow as pa

    base = "x" * 40 + "qwertyuiopasdfghjkl" * 10
    shifted = "PREFIX-" + base
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([base, shifted])})
    ch = textfn.cdc_chunks_batch(tbl).to_pandas()
    h0 = set(ch[ch.doc_id == 0]["chunk_hash"]) - {0}
    h1 = set(ch[ch.doc_id == 1]["chunk_hash"]) - {0}
    assert h0 & h1  # shared interior chunks despite the offset shift


def test_churn_labels_brute(ray_session):
    out = entry._churn_labels(SF).to_pandas()
    got = {
        r["user_id"]: (r["n_first"], r["n_second"], r["churned"])
        for _, r in out.iterrows()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["ts_us"] = ev["ts"].astype("int64")
    mid = (ev["ts_us"].min() + ev["ts_us"].max()) // 2
    want = {}
    for uid, g in ev.groupby("user_id"):
        nf = int((g["ts_us"] <= mid).sum())
        ns = int((g["ts_us"] > mid).sum())
        if nf > 0:
            want[uid] = (nf, ns, ns == 0)
    assert got == want

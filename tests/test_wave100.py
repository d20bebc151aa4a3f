"""Wave 100: positional catalog dedup, dup community profile — brutes."""

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_crossmatch_dedup_brute(ray_session):
    out = entry._crossmatch_dedup(SF).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_size"]))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    lon, lat = ops.positions_from_id(ids)
    v = ops.xyz_from_lonlat(lon, lat)
    s = math.sin(entry.JOIN_RADIUS_DEG * 0.5 * ops.RAD)
    thresh = 4.0 * s * s
    # union-find over within-radius pairs
    parent = {int(i): int(i) for i in ids}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(axis=2)
    ii, jj = np.where((d2 <= thresh) & (ids[:, None] != ids[None, :]))
    for a, b in zip(ids[ii].tolist(), ids[jj].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in ids.tolist():
        comp.setdefault(find(i), []).append(i)
    want = {min(m): len(m) for m in comp.values()}
    assert got == want
    # real multi-source objects exist and mass is conserved
    assert max(want.values()) > 1
    assert sum(want.values()) == len(ids)


def test_dup_community_profile_brute(ray_session):
    from spatialindex_ray.functions import dedup

    out = entry._dup_community_profile(SF).to_pandas()
    got = {
        r["cluster_id"]: (r["n_docs"], r["sum_tokens"]) for _, r in out.iterrows()
    }
    clusters = entry._dedup_clusters(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ntok = {d: len(t.split()) for d, t in zip(docs["doc_id"], docs["text"])}
    want = {}
    for cid, g in clusters.groupby("cluster_id"):
        want[cid] = (len(g), sum(ntok[d] for d in g["doc_id"]))
    assert got == want
    assert any(v[0] > 1 for v in want.values())

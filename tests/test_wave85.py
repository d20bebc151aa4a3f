"""Wave 85: trigram stupid-backoff scoring, hex occupancy clusters — brutes."""

import sys
from collections import Counter
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions import text as textfn  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_trigram_backoff_brute(ray_session):
    out = (
        textfn.trigram_backoff_query(SF)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {d: t.split() for d, t in zip(docs["doc_id"], docs["text"])}
    uni, bi, tri = Counter(), Counter(), Counter()
    n_train = 0
    for d, ws in toks.items():
        if d % 2 == 0:
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
            tri.update(zip(ws, ws[1:], ws[2:]))
            n_train += len(ws)
    want = {}
    for d, ws in toks.items():
        if d % 2 == 1 and len(ws) >= 3:
            tot = n = 0
            for g in zip(ws, ws[1:], ws[2:]):
                n += 1
                if tri[g]:
                    s = (tri[g] * textfn.TRIGRAM_SCALE) // bi[(g[0], g[1])]
                elif bi[(g[1], g[2])]:
                    s = (bi[(g[1], g[2])] * textfn.BO1_NUM) // uni[g[1]]
                elif uni[g[2]]:
                    s = (uni[g[2]] * textfn.BO2_NUM) // n_train
                else:
                    s = 0
                tot += s
            want[d] = (n, tot)
    got = {d: (int(r["n_pos"]), int(r["sum_ppm"])) for d, r in out.iterrows()}
    assert got == want
    # backoff genuinely fires on held-out docs (unseen trigrams exist)
    assert any(v[1] > 0 for v in want.values())


def test_hex_clusters_brute(ray_session):
    from spatialindex_ray import ops
    from spatialindex_ray.kernels import hexgrid

    out = entry._hex_clusters(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    lon, lat = ops.positions_from_id(docs["doc_id"].to_numpy())
    v = ops.xyz_from_lonlat(lon, lat)
    cells = np.unique(hexgrid.xyz_to_cell(v, entry.HEX_RES))
    occ = set(cells.tolist())
    # brute union-find over stitched-neighbor adjacency
    parent = {c: c for c in occ}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    nb = hexgrid.neighbors(cells.view(np.uint64), stitch=True)
    for i, c in enumerate(cells.tolist()):
        for d in nb[i].view(np.int64).tolist():
            if d in occ and d != c:
                ra, rb = find(c), find(d)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for c in occ:
        want.setdefault(c, None)
    labels = {c: find(c) for c in occ}
    # min-id per component
    comp_min = {}
    for c, r in labels.items():
        comp_min[r] = min(comp_min.get(r, c), c)
    want = {c: comp_min[labels[c]] for c in occ}
    got = dict(zip(out["hex_cell"], out["cluster_id"]))
    assert got == want
    assert len(set(want.values())) > 1

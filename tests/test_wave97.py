"""Wave 97: boolean retrieval, index size estimation — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_bool_search_brute(ray_session):
    out = entry._bool_search(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = set()
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = set(text.split())
        if all(w in toks for w in entry.BOOL_MUST) and entry.BOOL_NOT not in toks:
            want.add(did)
    assert set(out["doc_id"]) == want
    assert 0 < len(want) < len(docs)


def test_index_size_brute(ray_session):
    from spatialindex_ray import ops
    from spatialindex_ray.kernels import htm as htmk

    out = entry._index_size_estimate(SF).to_pandas()
    got = {
        r["prefix4"]: (r["n_cells"], r["varint_bytes"]) for _, r in out.iterrows()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    lon, lat = ops.positions_from_id(docs["doc_id"].to_numpy())
    v = ops.xyz_from_lonlat(lon, lat)
    cells = np.unique(htmk.v3_id(v, entry.IDXSIZE_LEVEL))
    deltas = np.diff(np.concatenate([[0], cells]))

    def vb(d):
        n = 1
        while d >= (1 << (7 * n)):
            n += 1
        return n

    want = {}
    for c, d in zip(cells.tolist(), deltas.tolist()):
        p = c >> (2 * (entry.IDXSIZE_LEVEL - 4))
        nc, b = want.get(p, (0, 0))
        want[p] = (nc + 1, b + vb(d))
    assert got == want
    # varints actually compress: mean bytes/cell well under the 8-byte raw
    total_cells = sum(v[0] for v in want.values())
    total_bytes = sum(v[1] for v in want.values())
    assert total_bytes < 8 * total_cells

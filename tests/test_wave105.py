"""Wave 105: simhash hamming histogram, cone pair search — brutes."""

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import geom, ops  # noqa: E402
from spatialindex_ray.functions import dedup  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_simhash_hist_brute(ray_session):
    import pyarrow as pa

    out = entry._simhash_hamming_hist(SF).set_index("hamming")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sub = docs[docs["doc_id"] < entry.SIMHASH_HIST_LIMIT]
    tbl = pa.Table.from_pandas(sub, preserve_index=False)
    sig = dedup.simhash_batch(tbl).to_pandas().sort_values("doc_id")
    h = sig["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    want = np.zeros(65, dtype=np.int64)
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            want[bin(int(h[i] ^ h[j])).count("1")] += 1
    assert (out["n_pairs"].to_numpy() == want).all()
    assert want.sum() == len(h) * (len(h) - 1) // 2


def test_cone_pair_brute(ray_session):
    out = entry._cone_pair_search(SF).to_pandas()
    got = set(zip(out["left_id"], out["right_id"]))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    lon, lat = ops.positions_from_id(ids)
    v = ops.xyz_from_lonlat(lon, lat)
    cfg = entry.CONE_HTM
    cone = geom.Cone(cfg["ra"], cfg["dec"], cfg["radius"])
    m = v @ np.asarray(cone.center) >= cone.cosrad
    vi, ii = v[m], ids[m]
    s = math.sin(entry.CONE_PAIR_RADIUS_DEG * 0.5 * ops.RAD)
    thresh = 4.0 * s * s
    want = set()
    for a in range(len(ii)):
        for b in range(a + 1, len(ii)):
            if ((vi[a] - vi[b]) ** 2).sum() <= thresh:
                want.add((min(ii[a], ii[b]), max(ii[a], ii[b])))
    assert got == want
    assert want

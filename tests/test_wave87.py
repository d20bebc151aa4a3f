"""Wave 87: hex cross-resolution rollup, per-source bounding caps — brutes."""

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402
from spatialindex_ray.kernels import hexgrid  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_hex_rollup_brute(ray_session):
    out = entry._hex_rollup(SF).to_pandas()
    got = dict(zip(out["hex_parent"], out["n_rows"]))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    lon, lat = ops.positions_from_id(docs["doc_id"].to_numpy())
    v = ops.xyz_from_lonlat(lon, lat)
    cells = hexgrid.xyz_to_cell(v, entry.HEX_RES)
    uc, counts = np.unique(cells, return_counts=True)
    ctr = hexgrid.cell_center_xyz(uc)
    parents = hexgrid.xyz_to_cell(ctr, entry.HEX_RES - 1).view(np.int64)
    want = {}
    for p, c in zip(parents.tolist(), counts.tolist()):
        want[p] = want.get(p, 0) + c
    assert got == want
    assert sum(want.values()) == len(docs)  # rollup conserves mass


def test_source_cap_brute(ray_session):
    out = entry._source_cap(SF).to_pandas().set_index("source").sort_index()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    lon, lat = ops.positions_from_id(docs["doc_id"].to_numpy())
    v = ops.xyz_from_lonlat(lon, lat)
    for src, g in docs.groupby("source"):
        idx = g.index.to_numpy()
        vi = v[idx]
        si = np.round(vi * entry.CAP_SCALE).astype(np.int64).sum(axis=0)
        fx, fy, fz = (float(si[0]), float(si[1]), float(si[2]))
        nrm = math.sqrt(fx * fx + fy * fy + fz * fz)
        c = np.array([fx / nrm, fy / nrm, fz / nrm])
        md = (vi @ c).min()
        row = out.loc[src]
        assert row["n_docs"] == len(g)
        assert np.allclose([row["cx"], row["cy"], row["cz"]], c, rtol=0, atol=0)
        # every member is inside the reported cap
        assert (vi @ np.array([row["cx"], row["cy"], row["cz"]])).min() >= row[
            "cos_radius"
        ] - 1e-15
        assert abs(row["cos_radius"] - md) < 1e-12

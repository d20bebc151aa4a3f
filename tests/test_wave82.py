"""Wave 82: lift-ranked collocations, Haar band energies — brutes."""

import sys
from collections import Counter
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions import multimodal  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_collocation_lift_brute(ray_session):
    out = entry._collocation_lift(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    uni, bi = Counter(), Counter()
    for text in docs["text"]:
        toks = text.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n_tok = sum(uni.values())
    n_bg = sum(bi.values())
    rows = []
    for (w1, w2), c12 in bi.items():
        if c12 >= 5:
            lift = (c12 * n_tok * n_tok * 10**6) // (
                uni[w1] * uni[w2] * n_bg
            )
            rows.append((-lift, w1, w2, c12))
    rows.sort()
    want = rows[:25]
    got = list(
        zip(
            -out["lift_ppm"].to_numpy(),
            out["w1"],
            out["w2"],
            out["c12"].to_numpy(),
        )
    )
    assert got == want


def test_image_haar_brute(ray_session):
    out = (
        multimodal.image_haar_query(SF).to_pandas().set_index("doc_id").sort_index()
    )
    assert len(out) == 500
    for did in (0, 7, 123, 499):
        w = 8 + did % 24
        h = 8 + (did % 7) * 3
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((did + xx + yy) % 256).astype(np.int64)
        g = g[: h - h % 2, : w - w % 2]
        a, b = g[0::2, 0::2], g[0::2, 1::2]
        c, d = g[1::2, 0::2], g[1::2, 1::2]
        row = out.loc[did]
        assert row["ll_sum"] == (a + b + c + d).sum()
        assert row["lh_abs"] == np.abs(a - b + c - d).sum()
        assert row["hl_abs"] == np.abs(a + b - c - d).sum()
        assert row["hh_abs"] == np.abs(a - b - c + d).sum()

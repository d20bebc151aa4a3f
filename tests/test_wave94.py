"""Wave 94: scene keyframes, integer-quantized DFT — brutes."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from spatialindex_ray.functions import multimodal  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_scene_keyframes_brute(ray_session):
    out = multimodal.video_scene_keyframes_query(SF).to_pandas()
    got = {
        (r["doc_id"], r["scene_idx"]): (r["start_frame"], r["key_sum"])
        for _, r in out.iterrows()
    }
    F = multimodal.SCENE_FRAME_BYTES
    T = multimodal.SCENE_CUT_THRESHOLD
    want = {}
    for did in range(500):
        n = 256 + did % 1000
        raw = (did * 13 + np.arange(n, dtype=np.int64)) % 251
        k = n // F
        sums = raw[: k * F].reshape(k, F).sum(axis=1)
        starts = [0] + (np.flatnonzero(np.abs(np.diff(sums)) > T) + 1).tolist()
        for si, fr in enumerate(starts):
            want[(did, si)] = (fr, int(sums[fr]))
    assert got == want
    # multi-scene docs exist
    assert max(si for _, si in want) >= 1


def test_audio_dft_brute(ray_session):
    out = (
        multimodal.audio_dft_energy_query(SF)
        .to_pandas()
        .set_index(["doc_id", "k"])
        .sort_index()
    )
    N = multimodal.DFT_N
    n = np.arange(N, dtype=np.float64)
    for did in (0, 7, 123, 499):
        x = ((did * 7 + np.arange(N, dtype=np.int64)) % 200) - 100
        for k in multimodal.DFT_KS:
            ang = ((k * n) * multimodal._TWO_PI) / N
            cm = np.round(np.cos(ang) * multimodal.DFT_QUANT).astype(np.int64)
            sm = np.round(np.sin(ang) * multimodal.DFT_QUANT).astype(np.int64)
            row = out.loc[(did, k)]
            assert row["re_milli"] == int((x * cm).sum())
            assert row["im_milli"] == int((x * sm).sum())
    # the sawtooth's fundamental (period 200 = N/2 -> k=2) dominates
    mag = (
        out["re_milli"].astype(float) ** 2 + out["im_milli"].astype(float) ** 2
    )
    by_k = mag.groupby(level="k").sum()
    assert by_k.idxmax() == 2

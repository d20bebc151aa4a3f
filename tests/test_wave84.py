"""Wave 84: winnow dup pairs, coverage holes, audio pitch — brutes."""

import sys
from collections import Counter, defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions import multimodal, text as textfn  # noqa: E402

SF = "/root/testdata/sf0.001"


def _brute_fingerprints(docs):
    B, M = int(textfn._FP_BASE), 1 << 64
    K, W = textfn.WINNOW_K, textfn.WINNOW_W
    sets = defaultdict(set)
    for did, s in zip(docs["doc_id"], docs["text"]):
        bs = s.encode()
        hs = []
        for i in range(len(bs) - K + 1):
            h = 0
            for ch in bs[i : i + K]:
                h = (h * B + ch) % M
            hs.append(h)
        for e in range(W - 1, len(hs)):
            winh = hs[e - W + 1 : e + 1]
            sets[did].add(min(winh))
    return sets


def test_winnow_dup_pairs_brute(ray_session):
    out = entry._winnow_dup_pairs(SF).to_pandas()
    got = set(zip(out["left_id"], out["right_id"], out["shared"]))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sets = _brute_fingerprints(docs)
    dfreq = Counter(h for s in sets.values() for h in s)
    filt = {d: {h for h in s if dfreq[h] <= entry.WINNOW_DF_CAP} for d, s in sets.items()}
    ids = sorted(filt)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sh = len(filt[a] & filt[b])
            if sh >= entry.WINNOW_PAIR_T:
                want.add((a, b, sh))
    assert got == want
    assert want  # non-trivial at sf0.001


def test_coverage_holes_brute(ray_session):
    from spatialindex_ray import SpatialIndex, ops
    from spatialindex_ray.kernels import htm as htmk

    out = entry._coverage_holes(SF)
    cfg = entry.HOLES_CONE
    plan = SpatialIndex().cone_plan(
        cfg["ra"], cfg["dec"], cfg["radius"], mode=0, level=cfg["level"]
    )
    cover = np.concatenate(
        [np.arange(lo, hi + 1, dtype=np.int64) for lo, hi in plan["ranges"]]
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    lon, lat = ops.positions_from_id(docs["doc_id"].to_numpy())
    v = ops.xyz_from_lonlat(lon, lat)
    occ = set(htmk.v3_id(v, cfg["level"]).tolist())
    want = sorted(c for c in cover.tolist() if c not in occ)
    assert out["cell"].tolist() == want
    assert 0 < len(want) < len(cover)


def test_audio_pitch_brute(ray_session):
    out = (
        multimodal.audio_pitch_query(SF).to_pandas().set_index("doc_id").sort_index()
    )
    assert len(out) == 500
    N = multimodal.PITCH_LEN
    lags = np.arange(
        multimodal.PITCH_LAG_MIN, multimodal.PITCH_LAG_MAX + 1, multimodal.PITCH_LAG_STEP
    )
    n = np.arange(N, dtype=np.int64)
    for did in (0, 3, 11, 123, 499):
        p = multimodal._pitch_period(did)
        k = (did + n) % p - p // 2
        r = np.array([int((k[: N - L] * k[L:]).sum()) for L in lags])
        best = r.max()
        lag = int(lags[np.argmax(r == best)])
        row = out.loc[did]
        assert row["pitch_lag"] == lag
        assert row["r_max"] == best
        # the estimator recovers the true synthesis period
        assert lag == p

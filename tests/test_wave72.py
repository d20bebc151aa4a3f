"""Wave 72: clustering coefficients, audio ZCR, source co-visitation."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402
from spatialindex_ray.functions import multimodal  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_triangle_per_node_small(ray_session):
    import ray

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5 + edge 6-7
    edges = pd.DataFrame(
        {
            "left_id": [1, 1, 1, 2, 2, 3, 4, 6],
            "right_id": [2, 3, 4, 3, 4, 4, 5, 7],
        }
    )
    out = (
        ops.triangle_per_node(ray.data.from_pandas(edges))
        .to_pandas()
        .set_index("node")
    )
    want = {
        1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (3, 4),
        5: (0, 1), 6: (0, 1), 7: (0, 1),
    }
    for node, (tri, deg) in want.items():
        assert int(out.loc[node, "n_tri"]) == tri, node
        assert int(out.loc[node, "deg"]) == deg, node
    # triangle participation sums to 3x the global triangle count
    glob = ops.triangle_count(ray.data.from_pandas(edges)).to_pandas()
    assert int(out["n_tri"].sum()) == 3 * int(glob["n_triangles"].iloc[0])


def test_audio_zcr_brute(ray_session):
    out = (
        multimodal.audio_zcr_query(SF)
        .to_pandas()
        .set_index(["doc_id", "win"])
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    n = np.arange(multimodal.AUDIO_LEN, dtype=np.int64)
    for did in docs["doc_id"].to_numpy()[:40]:
        k = ((int(did) * 7 + n) % 200) - 100
        cross = (k[:-1] * k[1:]) < 0
        pos = np.arange(1, len(k))
        for w in range(multimodal.AUDIO_LEN // multimodal.AUDIO_WIN):
            m = (pos // multimodal.AUDIO_WIN) == w
            assert int(out.loc[(did, w), "n_cross"]) == int(cross[m].sum())


def test_source_covisitation_brute(ray_session):
    out = entry._source_covisitation(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    smap = docs.set_index("doc_id")["source"].to_dict()
    visits = {}
    for r in ev.itertuples(index=False):
        s = smap.get(int(r.event_id) % 500)
        if s is not None:
            visits.setdefault(r.user_id, set()).add(s)
    want = {}
    for srcs in visits.values():
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r.src_a, r.src_b): int(r.n_users) for r in out.itertuples(index=False)
    }
    assert got == want

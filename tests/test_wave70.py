"""Wave 70: image equalization, behavioral entropy, new-vs-returning; CC
fast-path/iterative equivalence."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402
from spatialindex_ray.functions import multimodal  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_image_equalize_brute(ray_session):
    out = (
        multimodal.image_equalize_query(SF)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    for did in docs["doc_id"].to_numpy()[:50]:
        w = 8 + int(did) % 24
        h = 8 + (int(did) % 7) * 3
        yy, xx = np.mgrid[0:h, 0:w]
        v = ((int(did) + xx + yy) % 256).ravel().astype(np.int64)
        cnt = np.bincount(v, minlength=256)
        cdf = np.cumsum(cnt)
        n = int(cdf[-1])
        cmin = int(cdf[np.flatnonzero(cnt)[0]])
        eq = (
            np.zeros(256, dtype=np.int64)
            if n == cmin
            else ((cdf - cmin) * 255) // (n - cmin)
        )
        assert int(out.loc[did, "eq_sum"]) == int((eq * cnt).sum())
        assert int(out.loc[did, "n_px"]) == n
    # equalized values live in [0, 255]; checksum bounded accordingly
    assert (out["eq_sum"] <= 255 * out["n_px"]).all()
    assert (out["eq_sum"] >= 0).all()


def test_type_entropy_brute(ray_session):
    out = entry._type_entropy_scaled(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    for uid, grp in ev.groupby("user_id"):
        c = grp["event_type"].value_counts().to_numpy().astype(np.int64)
        t = int(c.sum())
        want = int((c * ((t * entry.ENTROPY_SCALE) // c)).sum() // t)
        assert int(out.loc[uid, "n_events"]) == t
        assert int(out.loc[uid, "entropy_scaled"]) == want
    # single-type user floor: entropy_scaled == 1e6 exactly when 1 type
    ntypes = ev.groupby("user_id")["event_type"].nunique()
    single = ntypes[ntypes == 1].index
    assert (out.loc[single, "entropy_scaled"] == entry.ENTROPY_SCALE).all()


def test_daily_new_returning_brute(ray_session):
    out = entry._daily_new_returning(SF).to_pandas().set_index("day")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    df = pd.DataFrame({"u": ev["user_id"], "d": day}).drop_duplicates()
    first = df.groupby("u")["d"].min()
    for d, grp in df.groupby("d"):
        new = int((first.loc[grp["u"]] == d).sum())
        assert int(out.loc[d, "n_new"]) == new
        assert int(out.loc[d, "n_returning"]) == len(grp) - new
    # every user is new exactly once over the corpus
    assert int(out["n_new"].sum()) == df["u"].nunique()


def test_cc_fastpath_matches_iterative(ray_session):
    import ray

    # a chain (deep) plus a clique (dense) plus an isolate
    edges = pd.DataFrame(
        {
            "left_id": [1, 2, 3, 4, 10, 10, 11, 20, 30],
            "right_id": [2, 3, 4, 5, 11, 12, 12, 21, 31],
        }
    )
    nodes = pd.DataFrame({"doc_id": list(range(1, 6)) + [10, 11, 12, 20, 21, 30, 31, 99]})
    e_ds = ray.data.from_pandas(edges)
    n_ds = ray.data.from_pandas(nodes)
    fast = (
        ops.connected_components(e_ds, n_ds, node_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    slow = (
        ops.connected_components(
            ray.data.from_pandas(edges),
            ray.data.from_pandas(nodes),
            node_col="doc_id",
            small_edge_limit=0,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert fast.astype("int64").equals(slow.astype("int64"))
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10,
            20: 20, 21: 20, 30: 30, 31: 30, 99: 99}
    got = dict(zip(fast["doc_id"].astype(int), fast["cluster_id"].astype(int)))
    assert got == want

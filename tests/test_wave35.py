"""Edge-case tests for wave 35 (distributed convex hull, Gram power
iteration, closed-form hierarchy rollup, quantile normalization)."""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402


# ------------------------------------------------------------ hull chain
def test_hull_chain_square_grid_corners():
    g = np.array([[x, y] for x in range(6) for y in range(6)], np.int64)
    got = set(map(tuple, ops._hull_chain(g)))
    assert got == {(0, 0), (0, 5), (5, 0), (5, 5)}


def test_hull_chain_collinear_and_dupes():
    line = np.array([[i, 3 * i] for i in range(8)] * 2, np.int64)
    assert set(map(tuple, ops._hull_chain(line))) == {(0, 0), (7, 21)}
    one = np.array([[4, 4]] * 5, np.int64)
    assert set(map(tuple, ops._hull_chain(one))) == {(4, 4)}
    assert ops._hull_chain(np.empty((0, 2), np.int64)).shape == (0, 2)


def test_hull_chain_matches_brute_general_position():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(3, 60))
        pts = rng.integers(0, 1 << 20, size=(n, 2)).astype(np.int64)
        p = np.unique(pts, axis=0)
        m = len(p)
        verts = set()
        for i in range(m):
            d = p - p[i]
            for j in range(m):
                if i == j:
                    continue
                e = p[j] - p[i]
                cr = e[0] * d[:, 1] - e[1] * d[:, 0]
                mask = np.ones(m, bool)
                mask[i] = mask[j] = False
                if np.all(cr[mask] > 0):
                    verts.add(tuple(p[i]))
                    verts.add(tuple(p[j]))
        if not verts:  # collinear config: skip (general-position test)
            continue
        assert set(map(tuple, ops._hull_chain(pts))) == verts


@pytest.mark.usefixtures("ray_session")
def test_convex_hull_distributed_matches_single_chain():
    rng = np.random.default_rng(5)
    pts = rng.integers(0, 1 << 20, size=(5000, 2)).astype(np.int64)
    import ray

    ds = ray.data.from_arrow(
        pa.table({"hx": pa.array(pts[:, 0]), "hy": pa.array(pts[:, 1])})
    ).repartition(7)
    out = ops.convex_hull(ds, "hx", "hy")
    got = set(
        zip(out["hx"].to_pylist(), out["hy"].to_pylist())
    )
    want = set(map(tuple, ops._hull_chain(pts)))
    assert got == want


# ------------------------------------------------------- power iteration
def _write_embeddings(tmp, vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(len(vecs), dtype=np.int32)),
        }
    )
    pq.write_table(tbl, f"{tmp}/embeddings.parquet")


@pytest.mark.usefixtures("ray_session")
def test_power_iteration_recovers_dominant_axis(tmp_path):
    # vectors concentrated along axis 1: eigenvector ~ e1
    rng = np.random.default_rng(3)
    vecs = np.zeros((40, 4), np.float64)
    vecs[:, 0] = rng.normal(0, 1.0, 40)
    vecs[:, 1:] = rng.normal(0, 0.05, (40, 3))
    _write_embeddings(tmp_path, np.round(vecs, 6))
    out = entry._power_iteration(str(tmp_path)).to_pandas()
    v = out.sort_values("dim_i")["v_scaled"].to_numpy()
    assert np.argmax(np.abs(v)) == 0
    assert np.max(np.abs(v)) == entry._PI_SCALE  # rescale invariant
    assert np.all(np.abs(v[1:]) < entry._PI_SCALE * 0.3)


@pytest.mark.usefixtures("ray_session")
def test_power_iteration_exact_vs_bigint_reference(tmp_path):
    rng = np.random.default_rng(9)
    vecs = np.round(rng.normal(0, 0.3, (25, 5)), 6)
    _write_embeddings(tmp_path, vecs)
    out = entry._power_iteration(str(tmp_path)).to_pandas()
    v_engine = out.sort_values("dim_i")["v_scaled"].to_numpy()
    # independent arbitrary-precision reference
    m = np.round(vecs * 1e6).astype(object)
    g = (m.T @ m)
    v = [1] * 5
    for _ in range(entry._PI_ITERS):
        w = [sum(int(g[i][j]) * v[j] for j in range(5)) for i in range(5)]
        mx = max(abs(x) for x in w)
        v = [(x * entry._PI_SCALE) // mx for x in w]
    assert list(v_engine) == v


# ----------------------------------------------------------- bom rollup
def _write_parts(tmp, keys, prices):
    n = len(keys)
    tbl = pa.table(
        {
            "p_partkey": pa.array(np.asarray(keys, np.int64)),
            "p_name": pa.array(["p"] * n, pa.string()),
            "p_retailprice": pa.array(np.asarray(prices, np.float64)),
        }
    )
    pq.write_table(tbl, f"{tmp}/part.parquet")


@pytest.mark.usefixtures("ray_session")
def test_bom_rollup_root_totals_everything(tmp_path):
    keys = list(range(21))  # 4-ary tree, keys 0..20
    prices = [1.0] * 21
    _write_parts(tmp_path, keys, prices)
    out = entry._bom_rollup(str(tmp_path)).to_pandas().set_index("part_node")
    assert int(out.loc[0, "subtree_cents"]) == 2100  # root sees every node
    assert int(out.loc[0, "n_desc"]) == 21
    # leaf 20: only itself (children 80..83 don't exist)
    assert int(out.loc[20, "n_desc"]) == 1
    # node 1 subtree: {1} + {4..7} + {16..20 where parent in 4..7}
    want = {1, 4, 5, 6, 7} | {k for k in range(16, 21) if k >> 2 in (4, 5, 6, 7)}
    assert int(out.loc[1, "n_desc"]) == len(want)


@pytest.mark.usefixtures("ray_session")
def test_bom_rollup_matches_recursive_reference(tmp_path):
    rng = np.random.default_rng(4)
    n = 200
    prices = np.round(rng.uniform(1, 50, n), 2)
    _write_parts(tmp_path, list(range(n)), prices)
    out = entry._bom_rollup(str(tmp_path)).to_pandas().set_index("part_node")
    cents = np.round(prices * 100).astype(np.int64)
    # reference: explicit ancestor walk per node
    ref_sum = {}
    ref_cnt = {}
    for p in range(n):
        a = p
        chain = [a]
        while a > 0:
            a >>= 2
            chain.append(a)
        for node in chain:
            ref_sum[node] = ref_sum.get(node, 0) + int(cents[p])
            ref_cnt[node] = ref_cnt.get(node, 0) + 1
    assert len(out) == len(ref_sum)
    for node, s in ref_sum.items():
        assert int(out.loc[node, "subtree_cents"]) == s
        assert int(out.loc[node, "n_desc"]) == ref_cnt[node]


# -------------------------------------------------- quantile normalize
def _write_events_typed(tmp, types, values):
    n = len(types)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.arange(n, dtype=np.int64).astype("datetime64[us]")
            ),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(types, type=pa.string()),
            "value": pa.array(np.asarray(values, np.float64)),
            "props": pa.array([""] * n, type=pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp}/events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_quantile_normalize_two_equal_groups(tmp_path):
    # type a: 1,2,3  type b: 11,22,33 -> rank means (6.0,12.0,18.0)
    _write_events_typed(
        tmp_path,
        ["a", "a", "a", "b", "b", "b"],
        [1.0, 2.0, 3.0, 11.0, 22.0, 33.0],
    )
    out = entry._quantile_normalize(str(tmp_path)).to_pandas()
    got = out.sort_values(["event_type", "rnk"])["qn_cents"].tolist()
    assert got == [600, 1200, 1800, 600, 1200, 1800]


@pytest.mark.usefixtures("ray_session")
def test_quantile_normalize_unequal_groups_and_ties(tmp_path):
    # type a has 3 rows, type b has 1: rank 2,3 average only over a;
    # ties within a broken by event_id so ranks stay deterministic
    _write_events_typed(
        tmp_path, ["a", "a", "a", "b"], [5.0, 5.0, 7.0, 9.0]
    )
    out = (
        entry._quantile_normalize(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
    )
    # rank 1 mean = (500 + 900)//2 = 700; ranks 2,3 come from a alone
    by_row = out.set_index("event_id")
    assert int(by_row.loc[0, "qn_cents"]) == 700  # a value 5.0 rank1 (id tie-break)
    assert int(by_row.loc[1, "qn_cents"]) == 500  # a value 5.0 rank2
    assert int(by_row.loc[2, "qn_cents"]) == 700  # a value 7.0 rank3 -> only a
    assert int(by_row.loc[3, "qn_cents"]) == 700  # b value 9.0 rank1

"""Edge-case tests for wave 33 (Moran's I, adaptive quadtree, IDW,
naive-Bayes language scoring)."""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402


def _write_events_ids(tmp, event_ids):
    n = len(event_ids)
    tbl = pa.table(
        {
            "event_id": pa.array(np.array(event_ids, dtype=np.int64)),
            "ts": pa.array(np.zeros(n, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(["click"] * n, type=pa.string()),
            "value": pa.array(np.zeros(n)),
            "props": pa.array([""] * n, type=pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp}/events.parquet")


def _ids_in_same_fine_cell(k, deg):
    """First k event ids landing in the fine cell of id 0."""
    ids = np.arange(20000, dtype=np.int64)
    lon, lat = ops.positions_from_id(ids)
    cx = np.floor(lon / deg).astype(np.int64)
    cy = np.floor((lat + 90.0) / deg).astype(np.int64)
    m = (cx == cx[0]) & (cy == cy[0])
    got = ids[m][:k]
    assert len(got) == k, "not enough colliding ids in scan range"
    return got.tolist()


@pytest.mark.usefixtures("ray_session")
def test_quadtree_splits_hot_cell_to_depth2(tmp_path):
    # all events in ONE 11.25-degree cell: every level is over threshold
    # (thr = 1 + n//32 < n for n >= 2) -> single depth-2 leaf
    ids = _ids_in_same_fine_cell(40, entry._QT_DEG2)
    _write_events_ids(tmp_path, ids)
    out = entry._quadtree_adaptive(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert int(out["depth"].iloc[0]) == 2
    assert int(out["n_points"].iloc[0]) == 40


@pytest.mark.usefixtures("ray_session")
def test_quadtree_sparse_stays_depth0(tmp_path):
    # 3 scattered events, thr = 1 + 3//32 = 1: a depth-0 cell with 1 event
    # stays coarse; only multi-event coarse cells would split
    _write_events_ids(tmp_path, [0, 1, 2])
    out = entry._quadtree_adaptive(str(tmp_path)).to_pandas()
    assert int(out["n_points"].sum()) == 3
    # every singleton cell must be emitted at depth 0
    assert (out.loc[out["n_points"] == 1, "depth"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_moran_single_tile_no_pairs(tmp_path):
    ids = _ids_in_same_fine_cell(5, entry._MORAN_DEG)
    _write_events_ids(tmp_path, ids)
    out = entry._moran_i(str(tmp_path)).to_pandas()
    assert int(out["n_tiles"].iloc[0]) == 1
    assert int(out["w_pairs"].iloc[0]) == 0
    assert int(out["moran_num"].iloc[0]) == 0
    # z = 1*n - n = 0 for the single tile
    assert int(out["moran_den"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_moran_matches_oracle_on_tiny_input(tmp_path):
    import duckdb

    _write_events_ids(tmp_path, list(range(200)))
    eng = (
        entry._moran_i(str(tmp_path))
        .to_pandas()
        .iloc[0]
        .to_dict()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    orc = con.execute(entry.MORAN_I_ORACLE).fetchdf().iloc[0].to_dict()
    assert {k: int(v) for k, v in eng.items()} == {
        k: int(v) for k, v in orc.items()
    }


def _write_docs(tmp, texts, langs):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, f"{tmp}/documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_naive_bayes_tie_breaks_to_first_lang(tmp_path):
    # symmetric counts: both langs score 1 on "x" -> lexicographically
    # first lang wins for BOTH docs
    _write_docs(tmp_path, ["x", "x"], ["bb", "aa"])
    out = entry._naive_bayes_lang(str(tmp_path)).to_pandas()
    assert set(out["pred_lang"]) == {"aa"}


@pytest.mark.usefixtures("ray_session")
def test_naive_bayes_occurrence_weighting(tmp_path):
    # doc2's text repeats "b b b" so lang bb accumulates 3*3=9 vs aa's
    # single "a"; doc0 ("a b") scores aa: 1+0... a counts: (aa,a)=1;
    # b counts: (bb,b)=3. doc0 = "a b" -> aa: 1, bb: 3 -> bb wins.
    _write_docs(tmp_path, ["a b", "b b b"], ["aa", "bb"])
    out = (
        entry._naive_bayes_lang(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["pred_lang"]
    )
    assert out[0] == "bb" and out[1] == "bb"


@pytest.mark.usefixtures("ray_session")
def test_idw_weights_positive_and_bounded(tmp_path):
    # engine invariants: every emitted probe has n_docs >= 1 and
    # sum_w <= n_docs * WSCALE (w is capped at WSCALE when d2 ~ 0)
    _write_docs(tmp_path, ["t"] * 50, ["en"] * 50)
    out = entry._idw_interpolate(str(tmp_path)).to_pandas()
    assert (out["n_docs"] >= 1).all()
    assert (out["sum_w"] <= out["n_docs"] * entry._IDW_WSCALE).all()
    assert (out["sum_w"] > 0).all()

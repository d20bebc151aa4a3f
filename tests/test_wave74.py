"""Wave 74: 3-D Morton search, weighted median value, keyword sentences."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402
from spatialindex_ray.kernels import geohash as ghk  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_zorder3_cover_is_exact_partition(ray_session):
    # the cover of a box equals exactly the set of keys whose cells lie in it
    level = 4
    lo, hi = (3, 1, 5), (12, 9, 11)
    ranges = ghk.zorder3_cover(lo, hi, level)
    n = 1 << level
    ii, jj, kk = np.meshgrid(
        np.arange(n), np.arange(n), np.arange(n), indexing="ij"
    )
    keys = ghk.morton3_key(ii.ravel(), jj.ravel(), kk.ravel(), level)
    inside = (
        (ii.ravel() >= lo[0]) & (ii.ravel() <= hi[0])
        & (jj.ravel() >= lo[1]) & (jj.ravel() <= hi[1])
        & (kk.ravel() >= lo[2]) & (kk.ravel() <= hi[2])
    )
    mask = ops.ranges_mask(keys, ranges)
    assert (mask == inside).all()
    # ranges are sorted, disjoint, coalesced
    assert (np.diff(ranges[:, 0]) > 0).all()
    assert (ranges[1:, 0] > ranges[:-1, 1] + 1).all()


def test_zorder3_search_brute(ray_session):
    out = set(
        entry._zorder3_search(SF).to_pandas()["event_id"].astype(int).tolist()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    day0 = int(day.min())
    lon, lat = ops.positions_from_id(ev["event_id"].to_numpy())
    off = day - day0
    b = entry.Z3_BOX
    m = (
        (lon >= b["lon_lo"]) & (lon < b["lon_hi"])
        & (lat >= b["lat_lo"]) & (lat < b["lat_hi"])
        & (off >= b["day_off_lo"]) & (off <= b["day_off_hi"])
    )
    want = set(ev["event_id"].to_numpy()[m].astype(int).tolist())
    assert out == want


def test_weighted_median_value_brute(ray_session):
    out = entry._weighted_median_value(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    for t, grp_idx in ev.groupby("event_type").groups.items():
        c = np.sort(cents[ev.index.get_indexer(grp_idx)])
        vals, cnt = np.unique(c, return_counts=True)
        mass = vals * cnt
        cum = np.cumsum(mass)
        tot = int(cum[-1])
        pos = int(np.searchsorted(2 * cum, tot, side="left"))
        assert int(out.loc[t, "wmedian_cents"]) == int(vals[pos])
        assert int(out.loc[t, "total_unit"]) == tot


def test_keyword_sentences_brute(ray_session):
    out = entry._keyword_sentences(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    import re

    for r in docs.itertuples(index=False):
        sents = r.text.split(".")
        hits = sum(
            1 for s in sents if entry.KWS_TOKEN in re.split(r"\s+", s)
        )
        assert int(out.loc[r.doc_id, "n_sentences"]) == len(sents)
        assert int(out.loc[r.doc_id, "n_with_kw"]) == hits

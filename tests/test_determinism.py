"""Determinism: repeated runs of representative pipelines produce identical
results (required for lineage-based retries and resume idempotency)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NAMES = ["radius_join", "knn", "minhash_near_dup", "events_window_agg",
         "sessionize_events", "orders_customer_join", "crossmatch_best",
         "span_dedup"]


def _run(name):
    import __ray_entry__ as entry
    import ray.data as rd

    res = entry.queries()[name](SF)
    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    elif not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    res = res[sorted(res.columns)]
    return res.sort_values(list(res.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", NAMES)
def test_repeat_identical(ray_session, name):
    a = _run(name)
    b = _run(name)
    pd.testing.assert_frame_equal(a, b)

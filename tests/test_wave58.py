"""Wave 58: Cohen's kappa between stored lang and the LangID stage —
brute recompute, including the below-chance (negative kappa) truncation."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions.text import LangID  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_cohen_kappa_matches_brute(ray_session):
    out = entry._cohen_kappa(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    import pyarrow as pa

    pred = LangID()(pa.Table.from_pandas(docs[["doc_id", "text"]], preserve_index=False))
    df = pd.DataFrame(
        {"lang": docs["lang"].to_numpy(), "pred": pred["lang_pred"].to_numpy(zero_copy_only=False)}
    )
    n = len(df)
    agree = int((df["lang"] == df["pred"]).sum())
    rows = df["lang"].value_counts()
    cols = df["pred"].value_counts()
    S = int(sum(int(rows[c]) * int(cols[c]) for c in rows.index if c in cols.index))
    num, den = n * agree - S, n * n - S
    assert int(out["kappa_num"].iloc[0]) == num
    assert int(out["kappa_den"].iloc[0]) == den
    assert int(out["n_docs"].iloc[0]) == n
    assert int(out["n_agree"].iloc[0]) == agree
    # truncation toward zero (DuckDB // semantics), exercised by the
    # negative kappa this corpus produces
    want_milli = (abs(num) * 1000 // den) * (1 if num >= 0 else -1)
    assert int(out["kappa_milli"].iloc[0]) == want_milli
    # sanity: kappa in [-1, 1]
    assert -den <= num <= den

"""Wave 92: balanced sampling, minhash eval, exchange block-coercion."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_lang_balanced_sample_brute(ray_session):
    out = entry._lang_balanced_sample(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    quota = docs.groupby("lang").size().min()
    sizes = out.groupby("lang").size()
    assert (sizes == quota).all()
    assert set(sizes.index) == set(docs["lang"].unique())
    # picks really are the lowest-splitmix ranks per lang
    docs["hv"] = ops._splitmix64(docs["doc_id"].to_numpy())
    for lang, g in docs.groupby("lang"):
        want = set(
            g.sort_values(["hv", "doc_id"]).head(quota)["doc_id"].tolist()
        )
        assert set(out[out["lang"] == lang]["doc_id"]) == want


def test_minhash_eval_consistent(ray_session):
    from spatialindex_ray.functions import dedup

    row = entry._minhash_eval(SF).iloc[0]
    lim = dedup.NGRAM_DOC_LIMIT
    mh = {
        (r["left_id"], r["right_id"])
        for r in dedup.minhash_near_dup_query(SF).take_all()
        if r["left_id"] < lim and r["right_id"] < lim
    }
    ja = {
        (r["left_id"], r["right_id"])
        for r in dedup.ngram_jaccard_query(SF).take_all()
    }
    assert row["tp"] == len(mh & ja)
    assert row["fp"] == len(mh - ja)
    assert row["fn"] == len(ja - mh)


def test_exchange_coerces_pandas_blocks(ray_session):
    """Ray passes zero-row blocks through map_batches WITHOUT format
    conversion, so exchanges must accept stray pandas blocks (the
    minhash_eval off-repo failure)."""
    import ray

    pdf_empty = pd.DataFrame({"k": pd.Series([], dtype="int64")})
    tbl = pa.table({"k": pa.array(np.arange(20, dtype=np.int64) % 4)})
    ds = ray.data.from_pandas([pdf_empty]).union(ray.data.from_arrow(tbl))

    def count_shard(t: pa.Table) -> pa.Table:
        return pa.table(
            {"shard": pa.array([t["k"][0].as_py() if t.num_rows else -1]),
             "n": pa.array([t.num_rows])}
        )

    out = ops.hash_exchange(ds, "k", 4, count_shard).to_pandas()
    assert out["n"].sum() == 20

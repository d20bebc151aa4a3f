"""Wave 47 + round-3 oracle-conversion tests: planted image near-dups via
banded ahash LSH, the Horner-hash minhash/simhash SQL duals, and the
TPC-H Q13/Q17/Q22 shapes. These assert the invariants the DuckDB oracles
can't express — banding losslessness, hash-swap signature properties —
while tools/check_oracles.py (and the driver) covers value equality."""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402
from spatialindex_ray.functions import dedup, multimodal  # noqa: E402
from spatialindex_ray.kernels import hashing  # noqa: E402

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- ahash banding losslessness
def test_ahash_band_lsh_is_lossless_for_small_hamming():
    # pigeonhole: <= 3 differing bits cannot touch all 4 16-bit bands, so
    # every qualifying pair shares at least one exact band key
    rng = np.random.RandomState(7)
    base = rng.randint(0, 1 << 63, size=200, dtype=np.int64).view(np.uint64)
    for ham in range(0, 4):
        h2 = base.copy()
        for i in range(len(h2)):
            bits = rng.choice(64, size=ham, replace=False)
            for b in bits:
                h2[i] ^= np.uint64(1) << np.uint64(b)
        shared = np.zeros(len(base), dtype=bool)
        for b in range(4):
            k1 = (base >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            k2 = (h2 >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            shared |= k1 == k2
        assert shared.all(), f"hamming {ham} pair missed by banding"


def test_image_ahash_dup_planted_pairs(ray_session):
    out = multimodal.image_ahash_dup_query(SF).to_pandas()
    assert len(out) > 0
    # planted structure: most pairs are (i, i+250)
    planted = (out["right_id"] - out["left_id"] == 250).sum()
    assert planted > len(out) * 0.8
    # verify against brute force over the synthetic ahashes
    tbl = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64))})
    png = multimodal._synth_dup_pngs(tbl)
    ah = multimodal.AHash()(png)["ahash"].to_numpy().view(np.uint64)
    got = set(zip(out["left_id"], out["right_id"]))
    want = set()
    for i in range(500):
        x = ah[i] ^ ah[i + 1 :]
        js = np.flatnonzero(hashing.popcount64(x) <= multimodal.AHASH_DUP_MAX_HAMMING)
        for j in js:
            want.add((i, i + 1 + int(j)))
    assert got == want


# --------------------------------------------- minhash/simhash Horner duals
def test_minhash_signature_matches_duckdb_dual():
    import duckdb

    texts = ["the quick brown fox", "the quick brown fox jumps", "", "one",
             "a b", "x " * 40]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    sig = dedup.minhash_batch(tbl)
    s_engine = np.stack(sig["sig"].to_numpy(zero_copy_only=False))
    con = duckdb.connect()
    con.register("documents", tbl)
    # re-use the oracle's CTEs up to sigl
    sql = dedup.MINHASH_NEAR_DUP_ORACLE.split("bands AS (")[0].rstrip().rstrip(",")
    rows = con.sql(sql + "\nSELECT doc_id, sig FROM sigl ORDER BY doc_id").fetchall()
    s_sql = np.array([r[1] for r in rows], dtype=np.uint64).view(np.int64)
    assert np.array_equal(s_engine, s_sql)


def test_simhash_empty_and_single_token_rows():
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array(["", "hello", "hello hello hello"])})
    out = dedup.simhash_batch(tbl)["simhash"].to_pylist()
    assert out[0] == 0
    # all-identical tokens: every vote is unanimous -> simhash == token hash
    th = int(hashing.poly_hash64_of_column(pa.array(["hello"]))[0])
    assert out[1] == np.int64(np.uint64(th)).item() or out[1] == th - (1 << 64) * (th >> 63)
    assert out[1] == out[2]


def test_minhash_near_dup_still_finds_near_duplicates(ray_session):
    # hash-function swap must not change LSH recall behavior
    out = dedup.minhash_near_dup_query(SF).to_pandas()
    assert len(out) > 0
    assert (out["left_id"] < out["right_id"]).all()


# --------------------------------------------------------- TPC-H shapes
def test_q13_includes_zero_bucket_and_totals(ray_session):
    out = entry._q13_order_distribution(SF)
    import pandas as pd
    import pyarrow.parquet as pq

    n_cust = pq.read_metadata(f"{SF}/customer.parquet").num_rows
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderstatus"])
    n_with = orders[orders["o_orderstatus"] != entry.Q13_EXCLUDED_STATUS][
        "o_custkey"
    ].nunique()
    # the zero bucket exists IFF some customer has no qualifying orders
    # (the oracle's LEFT JOIN emits no c_count=0 group otherwise)
    if n_cust > n_with:
        assert int(out["custdist"].sum()) == n_cust
        assert (out["c_count"] == 0).any()
    else:
        assert int(out["custdist"].sum()) == n_with
        assert not (out["c_count"] == 0).any()


def test_q17_brand_filter_nonempty(ray_session):
    out = entry._q17_small_quantity(SF).to_pandas()
    assert len(out) == 1
    assert out["n_rows"].iloc[0] >= 0
    assert out["price_cents"].iloc[0] >= 0


def test_q22_exact_integer_average_cutoff(ray_session):
    out = entry._q22_idle_customers(SF).to_pandas()
    # every reported row aggregates customers strictly above the mean —
    # verify totals against a pandas recompute
    import pandas as pd

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.round(cust["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    pos = cents[cents > 0]
    rich = cust[cents * len(pos) > pos.sum()]
    recent = orders[orders["o_orderdate"] >= np.datetime64(entry.Q22_CUTOFF)]
    idle = rich[~rich["c_custkey"].isin(recent["o_custkey"])]
    want = idle.groupby("c_mktsegment").size()
    got = out.set_index("c_mktsegment")["numcust"]
    assert got.sort_index().to_dict() == want.sort_index().to_dict()


# ------------------------------------------------------------- wave 48
def test_q15_winner_is_global_max_with_ties(ray_session):
    import pandas as pd

    out = entry._q15_top_supplier(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice", "l_discount",
                                  "l_shipdate"])
    m = (li["l_shipdate"] >= np.datetime64(entry.Q15_DATE_LO)) & (
        li["l_shipdate"] < np.datetime64(entry.Q15_DATE_HI))
    li = li[m]
    units = (np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
             * (10000 - np.round(li["l_discount"].to_numpy() * 10000).astype(np.int64)))
    rev = pd.DataFrame({"s": li["l_suppkey"].to_numpy(), "u": units}).groupby("s")["u"].sum()
    assert set(out["s_suppkey"]) == set(rev[rev == rev.max()].index)
    assert (out["total_revenue_unit"] == rev.max()).all()


def test_doc_cosine_pairs_threshold_holds(ray_session):
    from spatialindex_ray.functions import text as textfn

    out = textfn.doc_cosine_pairs_query(SF).to_pandas()
    assert len(out) > 0
    # recompute norms brute-force and check the integer threshold on every
    # emitted pair (plus spot-check one excluded pair stays excluded)
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs[docs["doc_id"] < textfn.COSINE_DOC_LIMIT]
    from collections import Counter

    tf = {int(r.doc_id): Counter(r.text.split()) for r in docs.itertuples()}
    n2 = {d: sum(v * v for v in c.values()) for d, c in tf.items()}
    for r in out.itertuples():
        dot = sum(v * tf[int(r.right_id)].get(k, 0)
                  for k, v in tf[int(r.left_id)].items())
        assert dot == r.dot
        assert 25 * dot * dot >= 16 * n2[int(r.left_id)] * n2[int(r.right_id)]


def test_user_type_jaccard_matches_brute(ray_session):
    import pandas as pd

    # sf0.01: sf0.001's sparser per-user activity leaves no pair above tau
    sf = "/root/testdata/sf0.01"
    out = entry._user_type_jaccard(sf).to_pandas()
    assert len(out) > 0
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    types = sorted(ev["event_type"].unique())
    tid = {t: i for i, t in enumerate(types)}
    dow = (ev["ts"].to_numpy().astype("datetime64[D]").astype(np.int64) + 4) % 7
    sym = ev["event_type"].map(tid).to_numpy() * 7 + dow
    masks = {}
    for u, s in zip(ev["user_id"], sym):
        masks[u] = masks.get(u, 0) | (1 << int(s))
    users = sorted(masks)
    want = set()
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            inter = bin(masks[a] & masks[b]).count("1")
            uni = bin(masks[a] | masks[b]).count("1")
            if entry.JACCARD_TAU_DEN * inter >= entry.JACCARD_TAU_NUM * uni:
                want.add((a, b))
    got = set(zip(out["left_user"], out["right_user"]))
    assert got == want

"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All operators are Dataset -> Dataset `map_batches` stages. The stateful ones
(compiled regexes, stopword tables) are callable CLASSES run as actor pools:
setup happens once per actor in __init__, never per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import hashing

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier (public common-words lists).
STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "is", "it", "that", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht"},
    "fr": {"le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "es", "un", "una", "que", "por"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "不", "人", "这"},
}


# GPT-2-style pre-tokenizer pattern, RE2-compatible (no lookahead): word
# pieces, numbers, punctuation runs, leading-space variants — the "BPE-ish"
# token estimate a training-data pipeline budgets with.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_stats_batch(tbl: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """doc_id, n_tokens (RE2 '\\S+' run count), n_bpe_tokens (GPT-2-style
    pre-tokenizer pattern), n_chars (utf8 length) — all through the same
    RE2 engine DuckDB uses, so the oracle matches exactly."""
    n_tokens = pc.count_substring_regex(tbl[text_col], r"\S+")
    n_bpe = pc.count_substring_regex(tbl[text_col], BPE_PATTERN)
    n_chars = pc.utf8_length(tbl[text_col])
    return pa.table(
        {
            id_col: tbl[id_col],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_chars": pc.cast(n_chars, pa.int64()),
        }
    )


TOKEN_STATS_ORACLE = rf"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def token_stats_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow", batch_size=None)


def _token_segments(text_col):
    """(flat tokens array, row offsets) from a string column — one Arrow
    whitespace split, zero per-row Python. Empty tokens (Arrow emits them
    for empty strings and leading/trailing whitespace; str.split() does
    not) are dropped so semantics match Python's split."""
    toks = pc.utf8_split_whitespace(text_col.combine_chunks())
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets).astype(np.int64)
    flat = toks.flatten()
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    nonempty = lens > 0
    if not nonempty.all():
        cs = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
        offsets = cs[offsets]
        flat = flat.filter(pa.array(nonempty))
    return flat, offsets


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat token-aligned array (wrap-safe cumsum diff)."""
    cs = np.concatenate([[0], np.cumsum(values, dtype=np.float64)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


class LangID:
    """Stopword-vote language identifier. Vectorized (round 2): one Arrow
    whitespace split, per-language pc.is_in membership over the flat token
    array, segment-sum votes — no per-row Python. Actor-pool stage: the
    stopword value sets are built once per actor in __init__."""

    def __init__(self):
        self.langs = sorted(STOPWORDS)
        self.value_sets = {
            lang: pa.array(sorted(STOPWORDS[lang])) for lang in self.langs
        }

    def __call__(self, tbl: pa.Table) -> pa.Table:
        flat, offsets = _token_segments(tbl["text"])
        n = len(tbl)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for k, lang in enumerate(self.langs):
            member = pc.is_in(flat, value_set=self.value_sets[lang])
            vals = member.to_numpy(zero_copy_only=False).astype(np.int64)
            scores[:, k] = _segment_sum(vals, offsets).astype(np.int64)
        # tie-break identical to max(key=(score, lang)): the lexicographically
        # LARGEST language among equal scores wins
        rev = scores[:, ::-1]
        best_rev = np.argmax(rev, axis=1)
        best = len(self.langs) - 1 - best_rev
        best_score = scores[np.arange(n), best]
        langs_arr = np.array(self.langs)
        preds = np.where(best_score > 0, langs_arr[best], "und")
        return pa.table({"doc_id": tbl["doc_id"], "lang_pred": pa.array(preds)})


def lang_id_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangID, batch_format="pyarrow", batch_size=None, concurrency=2)


def _lang_id_oracle() -> str:
    """DuckDB dual of LangID: per-language stopword votes over \\S+ tokens,
    winner = max votes with lexicographically-largest language on ties,
    'und' when all votes are zero."""
    langs = sorted(STOPWORDS)
    score_cols = []
    for lang in langs:
        inlist = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
        score_cols.append(
            f"len(list_filter(toks, x -> x IN ({inlist}))) AS s_{lang}"
        )
    g = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    # ties: lexicographically largest language wins -> test in reverse order
    branches = "\n       ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in reversed(langs[1:])
    )
    return rf"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
v AS (SELECT doc_id, {", ".join(score_cols)} FROM t),
vm AS (SELECT *, {g} AS m FROM v)
SELECT doc_id,
  CASE WHEN m = 0 THEN 'und'
       {branches}
       ELSE '{langs[0]}' END AS lang_pred
FROM vm
"""


LANG_ID_ORACLE = _lang_id_oracle()


def quality_score_batch(tbl: pa.Table) -> pa.Table:
    """Heuristic quality scoring: mean token length, alpha ratio, repetition
    ratio (distinct/total tokens). Fully vectorized (round 2): one Arrow
    split, utf8_length / utf8_is_alpha over the flat token array with
    segment sums; distinct counts via a token-hash sort per batch."""
    flat, offsets = _token_segments(tbl["text"])
    n = len(tbl)
    ntok = (offsets[1:] - offsets[:-1]).astype(np.float64)
    has = ntok > 0
    safe = np.maximum(ntok, 1.0)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    mean_len = _segment_sum(tok_lens, offsets) / safe
    alpha_flags = pc.utf8_is_alpha(flat).to_numpy(zero_copy_only=False)
    # match str.isalpha(): empty tokens are not alpha (Arrow agrees), and
    # whitespace split never yields empties anyway
    alpha = _segment_sum(alpha_flags.astype(np.int64), offsets) / safe
    # distinct tokens per row: 64-bit token hash, sort within rows, count
    # boundaries (collisions astronomically unlikely per ~1e3-token rows)
    th = hashing.poly_hash64_of_tokens(flat)
    row_of = np.repeat(np.arange(n, dtype=np.int64), (offsets[1:] - offsets[:-1]))
    order = np.lexsort((th, row_of))
    sh, sr = th[order], row_of[order]
    new = np.ones(len(sh), dtype=np.int64)
    if len(sh) > 1:
        new[1:] = (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])
    distinct = np.bincount(sr, weights=new, minlength=n)
    distinct_ratio = distinct / safe
    raw = (
        40.0 * np.minimum(mean_len / 6.0, 1.0)
        + 30.0 * distinct_ratio
        + 30.0 * alpha
    )
    scores = np.where(has, raw.astype(np.int64), 0)
    return pa.table({"doc_id": tbl["doc_id"], "quality": pa.array(scores)})


QUALITY_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(length(tok)) AS DOUBLE) AS lensum,
         CAST(COUNT(DISTINCT tok) AS DOUBLE) AS dn,
         CAST(SUM(CASE WHEN regexp_full_match(tok, '[A-Za-z]+') THEN 1 ELSE 0 END) AS DOUBLE) AS an
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(
         floor(40.0 * least((a.lensum / a.n) / 6.0, 1.0)
               + 30.0 * (a.dn / a.n)
               + 30.0 * (a.an / a.n)),
         0.0) AS BIGINT) AS quality
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


TOP_TERMS_K = 20


def top_terms_query(sf_dir: str, k: int = TOP_TERMS_K):
    """Global top-k terms by total frequency across the corpus, ties broken
    by term — the groupby + global-sort + limit path. Per-batch partial
    counts (Arrow value_counts) shrink the shuffle to near-vocabulary size
    before the keyed aggregate; only (term, count) ever moves."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(tbl: pa.Table) -> pa.Table:
        flat, _ = _token_segments(tbl["text"])
        vc = flat.value_counts()
        return pa.table(
            {
                "term": vc.field("values"),
                "partial_n": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("partial_n")
    )
    out = counts.sort(["sum(partial_n)", "term"], descending=[True, False]).limit(k)

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(["term", "n"])

    return out.map_batches(rename, batch_format="pyarrow", batch_size=None)


TOP_TERMS_PER_GROUP = 5


def top_terms_by_lang_query(sf_dir: str, k: int = TOP_TERMS_PER_GROUP):
    """Per-group top-k (the window-rank pattern): the k most frequent terms
    within each language, ties by term. Partial (lang, term) counts shrink
    the shuffle to near-vocabulary size; the rank itself runs per group in
    map_groups over the tiny aggregated distribution."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        flat, offsets = _token_segments(tbl["text"])
        langs = tbl["lang"].to_numpy(zero_copy_only=False)
        row_of = np.repeat(
            np.arange(len(langs)), (offsets[1:] - offsets[:-1])
        )
        df = pd.DataFrame({"lang": langs[row_of], "term": flat.to_numpy(zero_copy_only=False)})
        g = df.groupby(["lang", "term"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "partial_n"}), preserve_index=False
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "term"])
        .sum("partial_n")
    )

    def topk(df):
        df = df.rename(columns={"sum(partial_n)": "n"})
        df = df.sort_values(["n", "term"], ascending=[False, True],
                            kind="mergesort").head(k)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        df["n"] = df["n"].astype("int64")
        return df[["lang", "term", "n", "rank"]]

    return counts.groupby("lang").map_groups(topk, batch_format="pandas")


TOP_TERMS_BY_LANG_ORACLE = rf"""
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
c AS (SELECT lang, term, count(*) AS n FROM t GROUP BY lang, term)
SELECT lang, term, n,
  CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS BIGINT) AS rank
FROM c QUALIFY rank <= {TOP_TERMS_PER_GROUP}
"""


TOP_TERMS_ORACLE = rf"""
WITH t AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)
SELECT term, count(*) AS n FROM t GROUP BY term
ORDER BY n DESC, term LIMIT {TOP_TERMS_K}
"""


def quality_score_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow", batch_size=None)


_FP_BASE = np.uint64(1099511628211)


def fingerprint_batch(tbl: pa.Table) -> pa.Table:
    """64-bit polynomial rolling-hash fingerprint of the raw utf8 text bytes:
    h = B^L + sum_k b_k * B^(L-1-k)  (mod 2^64).

    O(total bytes) segment-wise Horner over the zero-copy Arrow buffer
    (kernels/hashing.poly_hash64) — no padded (N, Lmax) matrix, so one long
    outlier document costs only its own bytes (VERDICT r1 item 2). Values
    are unchanged vs the round-1 implementation."""
    fps = hashing.poly_hash64_of_column(tbl["text"], base=_FP_BASE)
    return pa.table(
        {"doc_id": tbl["doc_id"], "fingerprint": pa.array(fps.view(np.int64))}
    )


def fingerprint_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", batch_size=None)


# DuckDB dual of fingerprint_batch: per-char HUGEINT Horner mod 2^64 via
# list_reduce (init acc = 1 -> the leading B^L term), then two's-complement
# fold to BIGINT to match the uint64->int64 view. Valid for ASCII text
# (unicode(c) == byte value; the synth documents tables are ASCII — asserted
# in tests/test_functions.py::test_fingerprint_oracle_ascii_assumption).
FINGERPRINT_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
    CASE WHEN length(text) = 0 THEN CAST(1 AS HUGEINT)
         ELSE list_reduce(
           list_prepend(CAST(1 AS HUGEINT),
             list_transform(string_split(text, ''),
                            c -> CAST(unicode(c) AS HUGEINT))),
           (a, b) -> (a * {int(_FP_BASE)} + b) % 18446744073709551616)
    END AS hv
  FROM documents)
SELECT doc_id,
  CAST(hv - CASE WHEN hv >= 9223372036854775808 THEN 18446744073709551616
                 ELSE 0 END AS BIGINT) AS fingerprint
FROM h
"""


# ------------------------------------------------------- winnowing (MOSS)
WINNOW_K = 8  # k-gram length in chars
WINNOW_W = 4  # winnowing window in k-gram positions
_FP_BASE_INV = np.uint64(pow(int(_FP_BASE), -1, 1 << 64))


def winnow_batch(tbl: pa.Table, k: int = WINNOW_K, w: int = WINNOW_W) -> pa.Table:
    """MOSS-style winnowing fingerprint selection (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003): per document, hash every k-char gram with the same
    base-B Horner polynomial the doc fingerprint uses, then in every window
    of w consecutive positions keep the minimum hash — rightmost position on
    ties.  The distinct selected (pos, hash) pairs are the fingerprint set;
    any substring shared between two docs of length >= k + w - 1 is
    guaranteed to contribute at least one shared fingerprint.

    Fully vectorized over the batch's flat Arrow byte buffer, no per-row
    Python: one modular prefix scan C[i] = sum_{j<i} b_j * B^{-j} (uint64
    wraparound; B is odd so B^{-1} mod 2^64 exists) gives every gram hash as
    H[i] = B^{i+k-1} * (C[i+k] - C[i]); the window rightmost-argmin runs as
    one argmin over a reversed sliding_window_view, with windows that cross
    a document boundary masked out."""
    data, offsets = hashing.arrow_string_buffer(tbl["text"])
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    n = len(data)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "gram_hash": pa.array([], pa.int64()),
        }
    )
    if n < k:
        return empty
    b = data.astype(np.uint64)
    # prefix C[i] = sum_{j<i} b_j * Binv^j  (mod 2^64, natural uint64 wrap)
    binv_pow = np.empty(n, dtype=np.uint64)
    binv_pow[0] = 1
    np.cumprod(np.full(n - 1, _FP_BASE_INV, dtype=np.uint64), out=binv_pow[1:])
    c = np.empty(n + 1, dtype=np.uint64)
    c[0] = 0
    np.cumsum(b * binv_pow, out=c[1:])
    bpow = np.empty(n, dtype=np.uint64)
    bpow[0] = 1
    np.cumprod(np.full(n - 1, _FP_BASE, dtype=np.uint64), out=bpow[1:])
    # gram hash at every global byte index i (valid only within one doc)
    h_all = bpow[k - 1 :] * (c[k:] - c[:-k])  # length n-k+1
    lengths = offsets[1:] - offsets[:-1]
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lengths)
    # valid gram starts: i and i+k-1 in the same doc
    gi = np.arange(n - k + 1, dtype=np.int64)
    valid = doc_of[gi] == doc_of[gi + k - 1]
    vi = gi[valid]
    if len(vi) < w:
        return empty
    hv = h_all[valid]
    doc_v = doc_of[vi]
    pos_v = vi - offsets[:-1][doc_v]  # 0-based k-gram position within doc
    # sliding windows of w over the compacted hash array; a window is real
    # only if its first and last members belong to the same doc
    win = np.lib.stride_tricks.sliding_window_view(hv, w)
    ok = doc_v[: len(hv) - w + 1] == doc_v[w - 1 :]
    rev = win[:, ::-1]
    a = np.argmin(rev, axis=1)  # first min in reversed = rightmost min
    sel = np.arange(len(win), dtype=np.int64) + (w - 1) - a
    sel = np.unique(sel[ok])
    return pa.table(
        {
            "doc_id": pa.array(ids[doc_v[sel]]),
            "pos": pa.array(pos_v[sel] + 1),  # 1-based, matches SQL substring
            "gram_hash": pa.array(hv[sel].view(np.int64)),
        }
    )


def winnow_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(winnow_batch, batch_format="pyarrow", batch_size=None)


# DuckDB dual: per-position k-gram Horner hash (plain Horner — list_reduce
# seeds the accumulator with the first char, identical to the engine's
# B^{i+k-1}*(C[i+k]-C[i]) algebra), window of W positions exploded by a
# bounded self-join, rightmost-argmin via row_number ORDER BY hv ASC, p DESC,
# then DISTINCT selections. ASCII assumption as FINGERPRINT_ORACLE.
WINNOW_ORACLE = f"""
WITH g AS (
  SELECT doc_id, gs.p AS p,
    list_reduce(
      list_transform(string_split(substring(text, CAST(gs.p AS INTEGER), {WINNOW_K}), ''),
                     c -> CAST(unicode(c) AS HUGEINT)),
      (a, b) -> (a * {int(_FP_BASE)} + b) % 18446744073709551616) AS hv
  FROM documents, unnest(range(1, length(text) - {WINNOW_K} + 2)) AS gs(p)
  WHERE length(text) >= {WINNOW_K}),
w AS (
  SELECT e.doc_id, e.p AS epos, m.p AS p, m.hv
  FROM g e JOIN g m ON e.doc_id = m.doc_id
   AND m.p BETWEEN e.p - {WINNOW_W - 1} AND e.p
  WHERE e.p >= {WINNOW_W}),
sel AS (
  SELECT doc_id, epos, p, hv,
    row_number() OVER (PARTITION BY doc_id, epos
                       ORDER BY hv ASC, p DESC) AS rn
  FROM w)
SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos,
  CAST(hv - CASE WHEN hv >= 9223372036854775808 THEN 18446744073709551616
                 ELSE 0 END AS BIGINT) AS gram_hash
FROM sel WHERE rn = 1
"""


# ------------------------------------------- content-defined chunking (CDC)
CDC_K = WINNOW_K          # rolling window (chars) for the cut condition
CDC_MASK = 63             # cut where gram_hash % 64 == 0 (~64-char chunks)


def cdc_chunks_batch(tbl: pa.Table) -> pa.Table:
    """Content-defined chunking — the storage-dedup boundary rule (LBFS /
    restic-style): a cut opens AFTER every position whose k-gram rolling
    hash satisfies h % (CDC_MASK+1) == 0, so boundaries survive insertions
    and deletions (they depend only on local content, never on offsets).
    Emits (doc_id, chunk_idx, start, length, chunk_hash) with chunk_hash
    the same Horner polynomial the doc fingerprint uses (prefix-scan
    algebra: hash of [a, b) = B^(b-1) * (C[b] - C[a]) — zero re-reading).
    Unbounded variant (no min/max chunk size): the cut set is a pure
    parallel predicate, which is exactly what makes it SQL-dual-able and
    shard-stable."""
    data, offsets = hashing.arrow_string_buffer(tbl["text"])
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    n = len(data)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            "chunk_hash": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    k = CDC_K
    b = data.astype(np.uint64)
    binv_pow = np.empty(n, dtype=np.uint64)
    binv_pow[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _FP_BASE_INV, dtype=np.uint64), out=binv_pow[1:])
    c = np.empty(n + 1, dtype=np.uint64)
    c[0] = 0
    np.cumsum(b * binv_pow, out=c[1:])
    bpow = np.empty(n, dtype=np.uint64)
    bpow[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _FP_BASE, dtype=np.uint64), out=bpow[1:])

    def seg_hash(a: np.ndarray, bnd: np.ndarray) -> np.ndarray:
        # Horner hash of byte range [a, b) per pair; empty -> 0
        out = np.zeros(len(a), dtype=np.uint64)
        nz = bnd > a
        out[nz] = bpow[bnd[nz] - 1] * (c[bnd[nz]] - c[a[nz]])
        return out

    lengths = offsets[1:] - offsets[:-1]
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lengths)
    out_id, out_ci, out_st, out_ln, out_h = [], [], [], [], []
    # gram hashes at every in-doc window start (the winnow algebra)
    if n >= k:
        h_all = bpow[k - 1 :] * (c[k:] - c[:-k])
        gi = np.arange(n - k + 1, dtype=np.int64)
        valid = doc_of[gi] == doc_of[gi + k - 1]
        cut_pos = gi[valid & ((h_all & np.uint64(CDC_MASK)) == 0)]
        # a cut at window start p closes the chunk after byte p+k-1
        cut_end = cut_pos + k  # global byte index one past the chunk end
    else:
        cut_end = np.empty(0, dtype=np.int64)
    # per doc: boundaries = doc start, sorted in-doc cut ends, doc end
    cut_doc = doc_of[np.maximum(cut_end - 1, 0)] if len(cut_end) else cut_end
    for d in range(len(ids)):
        s, e = int(offsets[d]), int(offsets[d + 1])
        if e == s:
            continue
        ends = cut_end[cut_doc == d] if len(cut_end) else np.empty(0, np.int64)
        bounds = np.concatenate([[s], ends[ends < e], [e]]).astype(np.int64)
        a = bounds[:-1]
        bnd = bounds[1:]
        out_id.append(np.full(len(a), ids[d], dtype=np.int64))
        out_ci.append(np.arange(len(a), dtype=np.int64))
        out_st.append(a - s)
        out_ln.append(bnd - a)
        out_h.append(seg_hash(a, bnd).view(np.int64))
    if not out_id:
        return empty
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_id)),
            "chunk_idx": pa.array(np.concatenate(out_ci)),
            "start": pa.array(np.concatenate(out_st)),
            "length": pa.array(np.concatenate(out_ln)),
            "chunk_hash": pa.array(np.concatenate(out_h)),
        }
    )


def cdc_chunks_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(cdc_chunks_batch, batch_format="pyarrow", batch_size=None)


# DuckDB dual: cut positions from the same per-position k-gram Horner hash
# as WINNOW_ORACLE (h % 64 = 0), chunk spans via lead() over cut ends, and
# each chunk re-hashed with plain Horner over its substring.
# ASCII assumption (ADVICE r3): cdc_chunks_batch hashes UTF-8 BYTES while
# this dual hashes CODEPOINTS via unicode(c) — identical only for ASCII
# corpora. Same caveat as FINGERPRINT_ORACLE / WINNOW_ORACLE; guarded by
# tests/test_functions.py::test_fingerprint_oracle_ascii_assumption, which
# asserts the documents corpus these duals run against is pure ASCII.
CDC_CHUNKS_ORACLE = f"""
WITH g AS (
  SELECT doc_id, gs.p AS p,
    list_reduce(
      list_transform(string_split(substring(text, CAST(gs.p AS INTEGER), {CDC_K}), ''),
                     c -> CAST(unicode(c) AS HUGEINT)),
      (a, b) -> (a * {int(_FP_BASE)} + b) % 18446744073709551616) AS hv
  FROM documents, unnest(range(1, length(text) - {CDC_K} + 2)) AS gs(p)
  WHERE length(text) >= {CDC_K}),
cuts AS (
  SELECT doc_id, p + {CDC_K} - 1 AS cut_end  -- 1-based last byte of chunk
  FROM g WHERE hv % {CDC_MASK + 1} = 0),
bounds AS (
  SELECT d.doc_id, 0 AS e FROM documents d WHERE length(d.text) > 0
  UNION ALL
  SELECT c.doc_id, c.cut_end FROM cuts c
  JOIN documents d2 USING (doc_id) WHERE c.cut_end < length(d2.text)),
spans AS (
  SELECT b.doc_id, b.e AS start0,
         lead(b.e) OVER (PARTITION BY b.doc_id ORDER BY b.e) AS nxt,
         row_number() OVER (PARTITION BY b.doc_id ORDER BY b.e) - 1
           AS chunk_idx
  FROM bounds b),
sp2 AS (
  SELECT s.doc_id, s.chunk_idx, s.start0,
         COALESCE(s.nxt, length(d.text)) - s.start0 AS len
  FROM spans s JOIN documents d USING (doc_id)),
hashed AS (
  SELECT sp2.doc_id, chunk_idx, start0, len,
    CASE WHEN len = 0 THEN CAST(0 AS HUGEINT)
         ELSE list_reduce(
           list_transform(
             string_split(substring(d.text, CAST(start0 + 1 AS INTEGER),
                                    CAST(len AS INTEGER)), ''),
             c -> CAST(unicode(c) AS HUGEINT)),
           (a, b) -> (a * {int(_FP_BASE)} + b) % 18446744073709551616)
    END AS hv
  FROM sp2 JOIN documents d USING (doc_id))
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start0 AS BIGINT) AS start, CAST(len AS BIGINT) AS length,
       CAST(hv - CASE WHEN hv >= 9223372036854775808
                      THEN 18446744073709551616 ELSE 0 END AS BIGINT)
         AS chunk_hash
FROM hashed
"""


# ------------------------------------------------------- text scrubbing
SCRUB_PATTERN = r"\b(spark|secret|customer)\b"
SCRUB_REPLACEMENT = "[REDACTED]"


def scrub_query(sf_dir: str):
    """PII-style text scrubbing: replace every token matching SCRUB_PATTERN
    with a redaction marker — ONE vectorized Arrow RE2 pass over the whole
    batch (pc.replace_substring_regex), no per-row Python. DuckDB's
    regexp_replace runs the same RE2 engine, so the oracle is byte-exact.
    The transform class every training pipeline needs before tokenization
    (emails/phones/keys in real corpora); pattern swap is config, the
    distributed shape is identical."""
    import pyarrow.compute as pc

    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def scrub(tbl: pa.Table) -> pa.Table:
        clean = pc.replace_substring_regex(
            tbl["text"], pattern=SCRUB_PATTERN, replacement=SCRUB_REPLACEMENT
        )
        return pa.table(
            {
                "doc_id": tbl["doc_id"],
                "clean_text": clean,
                "n_chars_clean": pc.utf8_length(clean).cast(pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=None)


SCRUB_ORACLE = rf"""
SELECT doc_id,
  regexp_replace(text, '{SCRUB_PATTERN}', '{SCRUB_REPLACEMENT}', 'g')
    AS clean_text,
  CAST(length(regexp_replace(text, '{SCRUB_PATTERN}', '{SCRUB_REPLACEMENT}',
       'g')) AS BIGINT) AS n_chars_clean
FROM documents
"""


# ------------------------------------------------------- URL / domain stats
def domain_stats_query(sf_dir: str):
    """Per-domain corpus stats: synthesize a deterministic URL per doc
    ('https://<source>.example.org/doc/<doc_id>'), parse the HOST back out
    with one vectorized RE2 extraction (the real operator under web-corpus
    bucketing: crawls arrive as raw URLs), then a partial-aggregated
    groupby: docs + chars per domain. The oracle re-parses the same URL
    string with DuckDB's regexp_extract, so the extraction — not just the
    aggregate — is verified."""
    import pyarrow.compute as pc

    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def stats(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        url = pc.binary_join_element_wise(
            pa.array(["https://"] * len(tbl)),
            tbl["source"].cast(pa.string()),
            pa.array([".example.org/doc/"] * len(tbl)),
            pc.cast(tbl["doc_id"], pa.string()),
            "",
        )
        domain = pc.extract_regex(url, r"^https://(?P<host>[^/]+)/")
        host = pc.struct_field(domain, "host")
        df = pd.DataFrame(
            {
                "domain": host.to_numpy(zero_copy_only=False),
                "n_chars": tbl["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("domain", as_index=False).agg(
            n_docs=("n_chars", "size"), chars=("n_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(stats, batch_format="pyarrow", batch_size=None)
    out = parts.groupby("domain").sum(["n_docs", "chars"])

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "domain": tbl["domain"],
                "n_docs": tbl["sum(n_docs)"].cast(pa.int64()),
                "chars": tbl["sum(chars)"].cast(pa.int64()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow", batch_size=None)


DOMAIN_STATS_ORACLE = r"""
WITH u AS (
  SELECT n_chars,
    regexp_extract(
      'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR),
      '^https://([^/]+)/', 1) AS domain
  FROM documents)
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM u GROUP BY domain
"""


# --------------------------------------------------------- inverted index
POSTINGS_CAP = 100


def term_postings_query(sf_dir: str, cap: int = POSTINGS_CAP):
    """Capped inverted index — the search-engine core: per term, its
    document frequency plus the first ``cap`` posting doc_ids (ascending,
    comma-joined). Scale shape: the (term, doc) explode dedups inside each
    batch (a doc's text lives in exactly one row, so per-batch distinct IS
    global distinct), shards by term hash so each term's postings co-locate
    in one reduce, and the cap bounds per-term output — a stopword's
    posting list costs O(cap), not O(corpus). df keeps the TRUE count
    before truncation."""
    import ray
    import pandas as pd

    from .. import ops as _ops

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_shards = 64

    def explode(tbl: pa.Table) -> pa.Table:
        flat, offsets = _token_segments(tbl["text"])
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_rep = np.repeat(ids, np.diff(offsets))
        df = pd.DataFrame({"term": flat.to_pandas(), "doc_id": doc_rep})
        df = df.drop_duplicates()
        terms = pa.array(df["term"].to_numpy(dtype=object))
        shard = (_ops.hash64_strings(terms) % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "doc_id": pa.array(df["doc_id"].to_numpy()),
                "_shard": pa.array(shard),
            }
        )

    def per_shard(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        t = _ops._drop_shard(tbl)
        if t.num_rows == 0 or "term" not in t.schema.names:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
                 "postings": pa.array([], pa.string())}
            )
        df = t.to_pandas().sort_values(["term", "doc_id"], kind="mergesort")
        g = df.groupby("term", sort=False)
        df["df"] = g["doc_id"].transform("size").astype(np.int64)
        df["rn"] = g.cumcount()
        kept = df[df["rn"] < cap]
        out = (
            kept.assign(doc_s=kept["doc_id"].astype(str))
            .groupby("term", sort=False)
            .agg(df=("df", "first"), postings=("doc_s", ",".join))
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    tagged = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
    return _ops.hash_exchange(tagged, "_shard", n_shards, per_shard)


TERM_POSTINGS_ORACLE = rf"""
WITH t AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents)),
r AS (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY term) AS df
  FROM t)
SELECT term, CAST(max(df) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM r WHERE rn <= {POSTINGS_CAP} GROUP BY term
"""


IDF_SCALE = 1000


def tfidf_query(sf_dir: str):
    """Per-(doc, term) tf-idf with INTEGER-scaled idf: score_milli =
    tf * ((N * 1000) // df) — exact integer arithmetic end to end, so the
    distributed result hashes identically to SQL (no transcendental ln in
    the compared value; the 1000//df quantization is the documented
    contract). Scale shape: tf is a PURE MAP (each doc's text lives in one
    row, so per-batch (doc, term) counts are final — zero shuffle); df
    reduces per-batch distinct terms to a vocabulary-sized groupby; the
    (term, df) side broadcasts into the tf stream (one ray.put, not an
    exchange)."""
    import ray
    import pandas as pd

    from .. import ops as _ops

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()

    def tf_batch(tbl: pa.Table) -> pa.Table:
        flat, offsets = _token_segments(tbl["text"])
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_rep = np.repeat(ids, np.diff(offsets))
        df = pd.DataFrame({"doc_id": doc_rep, "term": flat.to_pandas()})
        g = df.groupby(["doc_id", "term"], as_index=False).size()
        g["size"] = g["size"].astype(np.int64)
        return pa.Table.from_pandas(
            g.rename(columns={"size": "tf"}), preserve_index=False
        )

    tf = ds.map_batches(tf_batch, batch_format="pyarrow", batch_size=None)

    def df_partial(tbl: pa.Table) -> pa.Table:
        # per-batch distinct (term, doc) -> per-term partial doc counts
        vc = tbl["term"].combine_chunks().value_counts()
        return pa.table(
            {"term": vc.field("values"),
             "partial_df": vc.field("counts").cast(pa.int64())}
        )

    dfreq = (
        tf.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("partial_df")
    )

    def df_rename(tbl: pa.Table) -> pa.Table:
        if "term" not in tbl.schema.names:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        return pa.table(
            {"term": tbl["term"], "df": tbl["sum(partial_df)"].cast(pa.int64())}
        )

    dfreq = dfreq.map_batches(df_rename, batch_format="pyarrow", batch_size=None)

    joined = _ops.equi_join(tf, dfreq, on="term", broadcast="right")

    def score(tbl: pa.Table) -> pa.Table:
        tfv = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        idf = (np.int64(n_docs) * np.int64(IDF_SCALE)) // dfv
        return pa.table(
            {
                "doc_id": tbl["doc_id"],
                "term": tbl["term"],
                "tf": pa.array(tfv),
                "df": pa.array(dfv),
                "score_milli": pa.array(tfv * idf),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow", batch_size=None)


TFIDF_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok GROUP BY 1),
n AS (SELECT count(*) AS c FROM documents)
SELECT tf.doc_id, tf.term, tf.tf, df.df,
       tf.tf * (((SELECT c FROM n) * {IDF_SCALE}) // df.df) AS score_milli
FROM tf JOIN df USING (term)
"""


COOC_TOP_K = 50


def term_cooccurrence_query(sf_dir: str, k: int = COOC_TOP_K):
    """Term co-occurrence counts restricted to the global top-k terms — the
    bounded-pair-space design that makes co-occurrence tractable at scale
    (pair candidates are k^2/2 cells, never vocab^2): the top-k list is a
    driver-sized aggregate broadcast into a per-batch distinct-intersect +
    vectorized pair explode; per-batch partial counts groupby-sum."""
    import ray
    import pandas as pd

    top = top_terms_query(sf_dir, k).to_pandas()["term"].tolist()
    top_arr = np.array(sorted(top), dtype=object)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def pairs(tbl: pa.Table) -> pa.Table:
        flat, offsets = _token_segments(tbl["text"])
        toks = flat.to_numpy(zero_copy_only=False).astype(object)
        doc_rep = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        idx = np.searchsorted(top_arr, toks)
        idx_c = np.clip(idx, 0, len(top_arr) - 1)
        hit = top_arr[idx_c] == toks
        d, t = doc_rep[hit], idx_c[hit]
        # fully vectorized pair counting: dense doc x term incidence matrix
        # (k <= 50, so k*k partials are tiny) -> one matmul gives per-batch
        # co-occurrence counts for every pair at once; no per-doc Python
        kdim = len(top_arr)
        m = np.zeros((len(offsets) - 1, kdim), dtype=np.int64)
        m[d, t] = 1
        co = m.T @ m
        ai, bi = np.triu_indices(kdim, k=1)
        cnt = co[ai, bi]
        nz = cnt > 0
        if not nz.any():
            return pa.table({"term_a": pa.array([], pa.string()),
                             "term_b": pa.array([], pa.string()),
                             "p": pa.array([], pa.int64())})
        return pa.table(
            {
                "term_a": pa.array(top_arr[ai[nz]]),
                "term_b": pa.array(top_arr[bi[nz]]),
                "p": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["term_a", "term_b"]).sum("p")
    )

    def proj(tbl: pa.Table) -> pa.Table:
        if "term_a" not in tbl.schema.names:
            return pa.table({"term_a": pa.array([], pa.string()),
                             "term_b": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        return pa.table({"term_a": tbl["term_a"], "term_b": tbl["term_b"],
                         "n_docs": tbl["sum(p)"].cast(pa.int64())})

    return agg.map_batches(proj, batch_format="pyarrow", batch_size=None)


TERM_COOC_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
  FROM documents),
top AS (SELECT term FROM tok GROUP BY term
        ORDER BY count(*) DESC, term LIMIT {COOC_TOP_K}),
g AS (SELECT DISTINCT doc_id, term FROM tok
      WHERE term IN (SELECT term FROM top))
SELECT a.term AS term_a, b.term AS term_b,
       CAST(count(*) AS BIGINT) AS n_docs
FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY 1, 2
"""


def normalized_dedup_query(sf_dir: str):
    """Canonicalized exact dedup: lower-case, strip non-[a-z0-9 ] chars,
    collapse runs of spaces, trim — then keep min doc_id per distinct
    NORMALIZED text. Catches case/punctuation near-identicals that byte
    dedup misses. All string work is vectorized Arrow kernels (RE2
    regexes — the same engine DuckDB uses, so the SQL dual is exact);
    only the 64-bit hash of the normalized text shuffles."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def norm_hash(tbl: pa.Table) -> pa.Table:
        t = pc.utf8_lower(tbl["text"])
        t = pc.replace_substring_regex(t, "[^a-z0-9 ]+", "")
        t = pc.replace_substring_regex(t, " +", " ")
        t = pc.utf8_trim_whitespace(t)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        hs = (hashing.sha1_pairs_of_column(t)[:, 0] >> np.uint64(1)).astype(
            np.int64
        )
        return pa.table({"h": pa.array(hs), "doc_id": tbl["doc_id"]})

    out = (
        ds.map_batches(norm_hash, batch_format="pyarrow", batch_size=None)
        .groupby("h")
        .min("doc_id")
    )

    def project(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "min(doc_id)" not in tbl.schema.names:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        return pa.table({"doc_id": tbl["min(doc_id)"]})

    return out.map_batches(project, batch_format="pyarrow", batch_size=None)


NORMALIZED_DEDUP_ORACLE = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', '',
              'g'), ' +', ' ', 'g')) AS nt
  FROM documents)
SELECT min(doc_id) AS doc_id FROM n GROUP BY nt
"""


VOCAB_K = 100


def vocab_coverage_query(sf_dir: str, k: int = VOCAB_K):
    """Vocabulary coverage per doc: how many of a doc's tokens fall in the
    corpus-global top-k vocabulary. Two-phase DERIVED-BROADCAST pipeline:
    phase 1 computes the top-k terms (top_terms_query machinery,
    deterministic (n desc, term) tie-break) — a PLAN-SIZED artifact that
    legitimately materializes at the driver and broadcasts via ray.put;
    phase 2 counts member tokens per doc with one Arrow is_in over the
    flat token array + a segment sum. Exact integers (doc_id, n_tok,
    n_in_vocab)."""
    import ray

    vocab_tbl = pa.concat_tables(
        b for b in top_terms_query(sf_dir, k).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    vocab_ref = ray.put(vocab_tbl["term"].combine_chunks())

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def coverage(tbl: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        flat, offsets = _token_segments(tbl["text"])
        member = pc.is_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
        n_in = _segment_sum(member.astype(np.int64), offsets).astype(np.int64)
        n_tok = (offsets[1:] - offsets[:-1]).astype(np.int64)
        return pa.table(
            {
                "doc_id": tbl["doc_id"],
                "n_tok": pa.array(n_tok),
                "n_in_vocab": pa.array(n_in),
            }
        )

    return ds.map_batches(coverage, batch_format="pyarrow", batch_size=None)


VOCAB_COVERAGE_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
top AS (SELECT tok FROM cnt
        QUALIFY row_number() OVER (ORDER BY n DESC, tok) <= {VOCAB_K}),
cov AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(CASE WHEN top.tok IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_in_vocab
  FROM toks t LEFT JOIN top ON t.tok = top.tok
  GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(c.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(COALESCE(c.n_in_vocab, 0) AS BIGINT) AS n_in_vocab
FROM documents d LEFT JOIN cov c ON d.doc_id = c.doc_id
"""


def table_fingerprint_query(sf_dir: str):
    """Order-invariant whole-table integrity fingerprint — the artifact a
    resumable pipeline records per stage to verify a retried/recomputed
    partition reproduced identical content regardless of row order or
    partitioning: n_rows + XOR and wrapping-SUM (mod 2^64) of each row's
    64-bit polynomial text fingerprint (fingerprint_batch values). XOR
    alone cancels duplicate pairs, SUM alone misses swaps — together with
    the count they make an order/partition-invariant check that is exact
    in integer arithmetic on both sides. Per-batch partials are one row
    each; a single reduce folds them (combiners are XOR/ADD — associative
    and commutative, so any tree shape gives the same answer)."""
    import ray

    from .. import ops as _ops

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(tbl: pa.Table) -> pa.Table:
        fps = hashing.poly_hash64_of_column(tbl["text"], base=_FP_BASE)
        return pa.table(
            {
                "shard": pa.array([0], type=pa.int64()),
                "n_rows": pa.array([len(fps)], type=pa.int64()),
                "xor_fp": pa.array(
                    np.array([np.bitwise_xor.reduce(fps)] if len(fps) else [0],
                             dtype=np.uint64).view(np.int64)
                ),
                "sum_fp": pa.array(
                    np.array([np.sum(fps, dtype=np.uint64)], dtype=np.uint64)
                    .view(np.int64)
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def fold(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "n_rows" not in tbl.schema.names:
            return pa.table(
                {
                    "n_rows": pa.array([0], type=pa.int64()),
                    "xor_fp": pa.array([0], type=pa.int64()),
                    "sum_fp": pa.array([0], type=pa.int64()),
                }
            )
        x = tbl["xor_fp"].to_numpy(zero_copy_only=False).view(np.uint64)
        s = tbl["sum_fp"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "n_rows": pa.array(
                    [int(tbl["n_rows"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
                "xor_fp": pa.array(
                    np.array([np.bitwise_xor.reduce(x)], dtype=np.uint64)
                    .view(np.int64)
                ),
                "sum_fp": pa.array(
                    np.array([np.sum(s, dtype=np.uint64)], dtype=np.uint64)
                    .view(np.int64)
                ),
            }
        )

    return _ops.hash_exchange(parts, "shard", 1, fold)


TABLE_FINGERPRINT_ORACLE = f"""
WITH h AS (
  SELECT CASE WHEN length(text) = 0 THEN CAST(1 AS HUGEINT)
         ELSE list_reduce(
           list_prepend(CAST(1 AS HUGEINT),
             list_transform(string_split(text, ''),
                            c -> CAST(unicode(c) AS HUGEINT))),
           (a, b) -> (a * {int(_FP_BASE)} + b) % 18446744073709551616)
    END AS hv
  FROM documents),
f AS (
  SELECT hv,
         CAST(hv - CASE WHEN hv >= 9223372036854775808
                        THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS hi
  FROM h)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(bit_xor(hi), 0) AS BIGINT) AS xor_fp,
       CAST((sum(hv) % 18446744073709551616)
            - CASE WHEN (sum(hv) % 18446744073709551616) >= 9223372036854775808
                   THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS sum_fp
FROM f
"""


TOP_BIGRAMS_K = 20


def top_bigrams_query(sf_dir: str, k: int = TOP_BIGRAMS_K):
    """Global top-k token BIGRAMS (collocation mining): adjacent-token
    pairs within each doc, counted corpus-wide, ties broken by bigram
    text. Bigram strings build vectorized — one elementwise binary join
    over the flat token array shifted by one, with cross-document seams
    masked out via the row offsets; per-batch value_counts shrink the
    shuffle to near-vocabulary-squared-but-observed size before the keyed
    aggregate."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(tbl: pa.Table) -> pa.Table:
        flat, offsets = _token_segments(tbl["text"])
        if len(flat) < 2:
            return pa.table(
                {
                    "bigram": pa.array([], type=pa.string()),
                    "partial_n": pa.array([], type=pa.int64()),
                }
            )
        pairs = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        )
        # drop seams: position i pairs token i with i+1 — invalid when i+1
        # is the first token of the next doc (i+1 in offsets[1:-1])
        keep = np.ones(len(pairs), dtype=bool)
        seam = offsets[1:-1] - 1
        keep[seam[(seam >= 0) & (seam < len(pairs))]] = False
        pairs = pairs.filter(pa.array(keep))
        vc = pairs.value_counts()
        return pa.table(
            {
                "bigram": vc.field("values"),
                "partial_n": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bigram")
        .sum("partial_n")
    )
    out = counts.sort(["sum(partial_n)", "bigram"], descending=[True, False]).limit(k)

    def rename(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or tbl.num_columns != 2:
            return pa.table(
                {
                    "bigram": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        return tbl.rename_columns(["bigram", "n"])

    return out.map_batches(rename, batch_format="pyarrow", batch_size=None)


TOP_BIGRAMS_ORACLE = rf"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
g AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bigram
  FROM w, unnest(range(1, greatest(CAST(length(ws) AS BIGINT), 1))) AS t(i))
SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY bigram
ORDER BY n DESC, bigram LIMIT {TOP_BIGRAMS_K}
"""


# ------------------------------------------------ sparse tf cosine pairs
COSINE_DOC_LIMIT = 300   # bounded subset: keeps the all-pairs oracle tractable
COSINE_TAU_NUM = 4       # tau = 4/5 = 0.8, compared in exact integers
COSINE_TAU_DEN = 5


def doc_cosine_pairs_query(sf_dir: str, limit: int = COSINE_DOC_LIMIT):
    """Sparse TF-cosine similarity join via posting lists — the exact dual
    of embedding ANN for bag-of-words vectors: explode (doc, term, tf),
    shard by term hash, per-term pair partial products tf_l*tf_r, one
    pair-keyed groupby-sum for the dot product, then an EXACT integer
    cosine test (tau^2 * norm_l * norm_r <= tau_den^2 ... cross-multiplied:
    25*dot^2 >= 16*nl*nr for tau=0.8) — no sqrt, no float, hash-identical
    to SQL. Bounded to doc_id < limit by spec (all-pairs oracle); at corpus
    scale the same pipeline runs behind a df-cap prefilter exactly like
    term_postings' cap. Products stay far under int64 at the bound
    (dot <= sum tf^2 ~ 1e5 -> 25*dot^2 ~ 2.5e11)."""
    import ray
    import pandas as pd

    from .. import ops as _ops

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def filter_subset(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.less(tbl["doc_id"], limit))

    sub = ds.map_batches(filter_subset, batch_format="pyarrow", batch_size=None)
    n_shards = 32

    def tf_explode(tbl: pa.Table) -> pa.Table:
        flat, offsets = _token_segments(tbl["text"])
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_rep = np.repeat(ids, np.diff(offsets))
        df = pd.DataFrame({"doc_id": doc_rep, "term": flat.to_pandas()})
        g = df.groupby(["doc_id", "term"], as_index=False).size()
        terms = pa.array(g["term"].to_numpy(dtype=object))
        shard = (_ops.hash64_strings(terms) % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "doc_id": pa.array(g["doc_id"].to_numpy().astype(np.int64)),
                "tf": pa.array(g["size"].to_numpy().astype(np.int64)),
                "_shard": pa.array(shard),
            }
        )

    tf = sub.map_batches(tf_explode, batch_format="pyarrow", batch_size=None)

    # per-doc squared norms: tf is per-doc-per-term final (each doc's text
    # lives in one row), so one small groupby-sum; the bounded subset makes
    # the norm table a driver-sized broadcast
    def norm_partial(tbl: pa.Table) -> pa.Table:
        t = tbl.select(["doc_id", "tf"])
        v = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        k, inv = np.unique(ids, return_inverse=True)
        s = np.zeros(len(k), dtype=np.int64)
        np.add.at(s, inv, v * v)
        return pa.table({"doc_id": pa.array(k), "n2": pa.array(s)})

    norms = (
        tf.map_batches(norm_partial, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .sum("n2")
        .to_pandas()
    )
    no = np.argsort(norms["doc_id"].to_numpy().astype(np.int64))
    nk = norms["doc_id"].to_numpy().astype(np.int64)[no]
    nv = norms["sum(n2)"].to_numpy().astype(np.int64)[no]
    import ray as _ray

    nref = _ray.put((nk, nv))

    def pair_partials(tbl: pa.Table) -> pa.Table:
        t = _ops._drop_shard(tbl)
        if t.num_rows == 0 or "term" not in t.schema.names:
            return pa.table(
                {"left_id": pa.array([], pa.int64()),
                 "right_id": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.int64())}
            )
        df = t.to_pandas()
        cand = df.merge(df, on="term", suffixes=("_l", "_r"))
        cand = cand[cand["doc_id_l"] < cand["doc_id_r"]]
        out = pd.DataFrame(
            {
                "left_id": cand["doc_id_l"].to_numpy(),
                "right_id": cand["doc_id_r"].to_numpy(),
                "partial": (cand["tf_l"] * cand["tf_r"]).to_numpy(),
            }
        )
        g = out.groupby(["left_id", "right_id"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    dots = _ops.hash_exchange(tf, "_shard", n_shards, pair_partials)
    agg = dots.groupby(["left_id", "right_id"]).sum("partial")

    def verify(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "left_id" not in tbl.schema.names:
            return pa.table(
                {"left_id": pa.array([], pa.int64()),
                 "right_id": pa.array([], pa.int64()),
                 "dot": pa.array([], pa.int64())}
            )
        keys, n2 = _ray.get(nref)
        li = tbl["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ri = tbl["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dot = tbl["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl = n2[np.searchsorted(keys, li)]
        nr = n2[np.searchsorted(keys, ri)]
        keep = (COSINE_TAU_DEN * COSINE_TAU_DEN) * dot * dot >= (
            COSINE_TAU_NUM * COSINE_TAU_NUM
        ) * nl * nr
        return pa.table(
            {"left_id": pa.array(li[keep]), "right_id": pa.array(ri[keep]),
             "dot": pa.array(dot[keep])}
        )

    return agg.map_batches(verify, batch_format="pyarrow", batch_size=None)


DOC_COSINE_PAIRS_ORACLE = rf"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents WHERE doc_id < {COSINE_DOC_LIMIT})
  GROUP BY 1, 2),
n2 AS (SELECT doc_id, sum(tf * tf) AS n2 FROM tf GROUP BY 1),
dots AS (
  SELECT l.doc_id AS left_id, r.doc_id AS right_id,
         sum(l.tf * r.tf) AS dot
  FROM tf l JOIN tf r ON l.term = r.term AND l.doc_id < r.doc_id
  GROUP BY 1, 2)
SELECT d.left_id, d.right_id, CAST(d.dot AS BIGINT) AS dot
FROM dots d JOIN n2 a ON a.doc_id = d.left_id JOIN n2 b ON b.doc_id = d.right_id
WHERE {COSINE_TAU_DEN * COSINE_TAU_DEN} * d.dot * d.dot
      >= {COSINE_TAU_NUM * COSINE_TAU_NUM} * a.n2 * b.n2
"""


# ----------------------------------------------- BPE merge-step statistics
BPE_TOP_K = 20


def bpe_top_merges_query(sf_dir: str, k: int = BPE_TOP_K):
    """The first step of BPE tokenizer training, distributed: corpus-wide
    counts of ADJACENT CHARACTER PAIRS inside whitespace tokens (the pair a
    byte-pair encoder would merge first), top-k with a deterministic
    (count DESC, pair ASC) tie-break. Per batch it is ONE np.bincount over
    the 65536-slot pair space computed straight off the flat Arrow token
    buffer (pair code = byte*256 + byte); only the nonzero (pair, count)
    rows — a few thousand — enter the groupby, so the shuffle is
    vocabulary-of-pairs sized no matter the corpus. ASCII corpus contract:
    pair codes order exactly like the SQL oracle's (char, char) strings."""
    import ray

    from ..kernels import hashing as _hashing

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def pair_partial(tbl: pa.Table) -> pa.Table:
        flat, offsets = _token_segments(tbl["text"])
        data, toff = _hashing.arrow_string_buffer(flat)
        if len(data) == 0:
            return pa.table(
                {"pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        codes = data[:-1].astype(np.int64) * 256 + data[1:].astype(np.int64)
        # drop pairs that straddle a token boundary: the pair at position i
        # spans bytes (i, i+1), invalid exactly when i+1 starts a new token
        # (toff is strictly increasing over nonempty tokens, so interior
        # boundaries are in [1, len(data) - 1])
        valid = np.ones(len(data) - 1, dtype=bool)
        valid[toff[1:-1] - 1] = False
        counts = np.bincount(codes[valid], minlength=65536)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"pair": pa.array(nz.astype(np.int64)),
             "n": pa.array(counts[nz].astype(np.int64))}
        )

    agg = (
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby("pair")
        .sum("n")
        .to_pandas()
    )
    agg = agg.rename(columns={"sum(n)": "n"})
    agg = agg.sort_values(["n", "pair"], ascending=[False, True], kind="mergesort")
    top = agg.head(k)
    import pandas as pd

    return pd.DataFrame(
        {
            "a": [chr(int(p) // 256) for p in top["pair"]],
            "b": [chr(int(p) % 256) for p in top["pair"]],
            "n": top["n"].to_numpy().astype(np.int64),
        }
    )


BPE_TOP_MERGES_ORACLE = rf"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS t FROM documents),
pr AS (
  SELECT substring(t, i, 1) AS a, substring(t, i + 1, 1) AS b
  FROM tok, unnest(range(1, length(t))) AS r(i)),
c AS (SELECT a, b, count(*) AS n FROM pr GROUP BY 1, 2)
SELECT a, b, CAST(n AS BIGINT) AS n FROM c
ORDER BY n DESC, a, b LIMIT {BPE_TOP_K}
"""


# --------------------------------------------- trigram LM, stupid backoff
# Brants et al. 2007 ("Large Language Models in Machine Translation"):
# S(w3|w1 w2) = c(w1w2w3)/c(w1w2), backing off to 0.4*c(w2w3)/c(w2), then
# 0.4^2*c(w3)/N — unnormalized, division-free to train, the standard
# web-scale n-gram scorer.  All scores here are exact integer ppm
# (floor(1e6 * ratio) via int64 //), so the distributed sum is order-free.
TRIGRAM_SCALE = 1_000_000
BO1_NUM = 400_000   # 0.4  * 1e6
BO2_NUM = 160_000   # 0.4^2 * 1e6
_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)
_MIX_C = np.uint64(0x165667B19E3779F9)


def _gram_keys(h: np.ndarray, offsets: np.ndarray):
    """(bi_keys, tri_keys, bi_rows, tri_rows) over a flat token-hash array
    with row offsets: windows never cross a row.  Keys are linear mixes mod
    2^64 — injective on this corpus exactly like the dedup gram hashes (the
    SQL dual joins on token STRINGS, so key collisions are the only parity
    risk and are 2^-64-scale)."""
    n_rows = len(offsets) - 1
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), offsets[1:] - offsets[:-1])
    with np.errstate(over="ignore"):
        bi = h[:-1] * _MIX_A + h[1:] * _MIX_B if len(h) >= 2 else np.empty(0, np.uint64)
        tri = (
            h[:-2] * _MIX_A + h[1:-1] * _MIX_B + h[2:] * _MIX_C
            if len(h) >= 3
            else np.empty(0, np.uint64)
        )
    bi_ok = row_of[:-1] == row_of[1:] if len(h) >= 2 else np.empty(0, bool)
    tri_ok = row_of[:-2] == row_of[2:] if len(h) >= 3 else np.empty(0, bool)
    return bi[bi_ok], tri[tri_ok], row_of[:-1][bi_ok], row_of[:-2][tri_ok]


class _SortedCounts:
    """Immutable sorted-key count table with vectorized lookup."""

    def __init__(self, keys: np.ndarray, counts: np.ndarray):
        order = np.argsort(keys)
        self.keys = keys[order]
        self.counts = counts[order]

    def get(self, q: np.ndarray) -> np.ndarray:
        if len(self.keys) == 0:
            return np.zeros(len(q), dtype=np.int64)
        idx = np.searchsorted(self.keys, q)
        idx = np.minimum(idx, len(self.keys) - 1)
        hit = self.keys[idx] == q
        out = np.where(hit, self.counts[idx], 0)
        return out.astype(np.int64)


def trigram_backoff_query(sf_dir: str):
    """Held-out trigram-LM scoring with stupid backoff: documents with even
    doc_id are TRAIN (uni/bi/tri-gram count model), odd doc_id are EVAL —
    each eval trigram position scores floor(1e6*c3/c12) if the trigram was
    seen in training, else floor(4e5*c23/c2), else floor(1.6e5*c1/N), else
    0.  Returns per eval doc (n_pos, sum_ppm) — the integer-exact analog of
    corpus perplexity, the filter every LLM data pipeline runs to drop
    out-of-distribution documents.

    Distributed shape: count tables build as per-batch np.unique partials +
    one (kind, key) groupby-sum; the fitted model is vocabulary-sized (<<
    data) and ships to scorers via ray.put once — the classic
    broadcast-model/stream-data split.  Scoring is one vectorized
    searchsorted pass per batch; per-doc sums are wrap-free int64."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def train_partials(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sub = tbl.filter(pc.equal(pc.bit_wise_and(tbl["doc_id"], 1), 0))
        flat, offsets = _token_segments(sub["text"])
        h = hashing.poly_hash64_of_tokens(flat)
        bi, tri, _, _ = _gram_keys(h, offsets)
        kinds, keys, cnts = [], [], []
        for kind, arr in ((0, h), (1, bi), (2, tri)):
            u, c = np.unique(arr, return_counts=True)
            kinds.append(np.full(len(u), kind, dtype=np.int64))
            keys.append(u)
            cnts.append(c.astype(np.int64))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds)),
                "key": pa.array(np.concatenate(keys).view(np.int64)),
                "partial": pa.array(np.concatenate(cnts)),
            }
        )

    counts = (
        ds.map_batches(train_partials, batch_format="pyarrow", batch_size=None)
        .groupby(["kind", "key"])
        .sum("partial")
    )
    tables = {0: ([], []), 1: ([], []), 2: ([], [])}
    for row in counts.iter_rows():
        k, c = tables[row["kind"]]
        k.append(row["key"])
        c.append(row["sum(partial)"])
    model = {}
    for kind, (k, c) in tables.items():
        model[kind] = _SortedCounts(
            np.array(k, dtype=np.int64).view(np.uint64), np.array(c, dtype=np.int64)
        )
    n_train = int(model[0].counts.sum())
    model_ref = ray.put((model, n_train))

    def score(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        import ray as _ray

        mdl, n_tr = _ray.get(model_ref)
        sub = tbl.filter(pc.equal(pc.bit_wise_and(tbl["doc_id"], 1), 1))
        ids = sub["doc_id"].to_numpy(zero_copy_only=False)
        flat, offsets = _token_segments(sub["text"])
        h = hashing.poly_hash64_of_tokens(flat)
        bi, tri, bi_rows, tri_rows = _gram_keys(h, offsets)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_pos": pa.array([], pa.int64()),
                "sum_ppm": pa.array([], pa.int64()),
            }
        )
        if len(tri) == 0:
            return empty
        # align: trigram at flat index i pairs with bi12 at i, bi23 at i+1,
        # u2 at i+1, u3 at i+2 — recompute from the same validity mask
        n_rows = len(offsets) - 1
        row_of = np.repeat(
            np.arange(n_rows, dtype=np.int64), offsets[1:] - offsets[:-1]
        )
        tri_ok = row_of[:-2] == row_of[2:]
        gi = np.arange(len(h) - 2, dtype=np.int64)[tri_ok]
        with np.errstate(over="ignore"):
            bi12 = h[gi] * _MIX_A + h[gi + 1] * _MIX_B
            bi23 = h[gi + 1] * _MIX_A + h[gi + 2] * _MIX_B
        c3 = mdl[2].get(tri)
        c12 = mdl[1].get(bi12)
        c23 = mdl[1].get(bi23)
        c2 = mdl[0].get(h[gi + 1])
        c1 = mdl[0].get(h[gi + 2])
        s = np.zeros(len(tri), dtype=np.int64)
        m3 = c3 > 0
        s[m3] = (c3[m3] * TRIGRAM_SCALE) // c12[m3]
        m2 = (~m3) & (c23 > 0)
        s[m2] = (c23[m2] * BO1_NUM) // c2[m2]
        m1 = (~m3) & (~m2) & (c1 > 0)
        s[m1] = (c1[m1] * BO2_NUM) // n_tr
        rows = tri_rows
        n_pos = np.bincount(rows, minlength=len(ids)).astype(np.int64)
        # per-doc ppm sums accumulate DIRECTLY in int64 (np.add.at) — exact
        # for any doc length, unlike float64-weighted bincount whose
        # exactness above 2^53 depended on an assert stripped under -O
        # (ADVICE r3)
        sums = np.zeros(len(ids), dtype=np.int64)
        np.add.at(sums, rows, s)
        keep = n_pos > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_pos": pa.array(n_pos[keep]),
                "sum_ppm": pa.array(sums[keep]),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


TRIGRAM_BACKOFF_ORACLE = rf"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
tok AS (SELECT doc_id, t.i AS i, ws[t.i] AS wd
        FROM w, unnest(range(1, len(ws) + 1)) AS t(i)),
trn AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
nn AS (SELECT count(*) AS n FROM trn),
uni AS (SELECT wd, count(*) AS c FROM trn GROUP BY wd),
bi AS (SELECT a.wd AS w1, b.wd AS w2, count(*) AS c
       FROM trn a JOIN trn b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       GROUP BY 1, 2),
tri AS (SELECT a.wd AS w1, b.wd AS w2, c.wd AS w3, count(*) AS c
        FROM trn a JOIN trn b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                   JOIN trn c ON a.doc_id = c.doc_id AND c.i = a.i + 2
        GROUP BY 1, 2, 3),
ev AS (SELECT a.doc_id, a.wd AS w1, b.wd AS w2, c.wd AS w3
       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
       WHERE a.doc_id % 2 = 1),
sc AS (SELECT ev.doc_id,
   CASE WHEN t.c IS NOT NULL THEN (t.c * {TRIGRAM_SCALE}) // b12.c
        WHEN b23.c IS NOT NULL THEN (b23.c * {BO1_NUM}) // u2.c
        WHEN u3.c IS NOT NULL THEN (u3.c * {BO2_NUM}) // (SELECT n FROM nn)
        ELSE 0 END AS s
   FROM ev LEFT JOIN tri t ON t.w1 = ev.w1 AND t.w2 = ev.w2 AND t.w3 = ev.w3
           LEFT JOIN bi b12 ON b12.w1 = ev.w1 AND b12.w2 = ev.w2
           LEFT JOIN bi b23 ON b23.w1 = ev.w2 AND b23.w2 = ev.w3
           LEFT JOIN uni u2 ON u2.wd = ev.w2
           LEFT JOIN uni u3 ON u3.wd = ev.w3)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
       CAST(sum(s) AS BIGINT) AS sum_ppm
FROM sc GROUP BY doc_id
"""

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

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier (public common-words lists).
STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "is", "it", "that", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht"},
    "fr": {"le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "es", "un", "una", "que", "por"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "不", "人", "这"},
}


def token_stats_batch(tbl: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """doc_id, n_tokens (RE2 '\\S+' run count — same regex engine as the
    DuckDB oracle), n_chars (utf8 length)."""
    n_tokens = pc.count_substring_regex(tbl[text_col], r"\S+")
    n_chars = pc.utf8_length(tbl[text_col])
    return pa.table(
        {
            id_col: tbl[id_col],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_chars": pc.cast(n_chars, pa.int64()),
        }
    )


TOKEN_STATS_ORACLE = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def token_stats_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow", batch_size=None)


class LangID:
    """Stopword-vote language identifier (actor-pool stage: stopword hash
    sets built once per actor)."""

    def __init__(self):
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
        self.langs = sorted(self.tables)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl["text"].to_pylist()
        preds = []
        for t in texts:
            toks = t.split()
            scores = {
                lang: sum(1 for w in toks if w in tbl_)
                for lang, tbl_ in self.tables.items()
            }
            best = max(self.langs, key=lambda lg: (scores[lg], lg))
            preds.append(best if scores[best] > 0 else "und")
        return pa.table({"doc_id": tbl["doc_id"], "lang_pred": pa.array(preds)})


def lang_id_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangID, batch_format="pyarrow", batch_size=None, concurrency=2)


def quality_score_batch(tbl: pa.Table) -> pa.Table:
    """Heuristic quality scoring: mean token length, alpha ratio, repetition
    ratio (distinct/total tokens) — all vectorized; score in [0, 100] as a
    deterministic int (stable across summation orders)."""
    texts = tbl["text"].to_pylist()
    n = len(texts)
    scores = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        mean_len = sum(len(w) for w in toks) / len(toks)
        distinct_ratio = len(set(toks)) / len(toks)
        alpha = sum(1 for w in toks if w.isalpha()) / len(toks)
        raw = 40.0 * min(mean_len / 6.0, 1.0) + 30.0 * distinct_ratio + 30.0 * alpha
        scores[i] = int(raw)
    return pa.table({"doc_id": tbl["doc_id"], "quality": pa.array(scores)})


def quality_score_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow", batch_size=None)


_FP_BASE = np.uint64(1099511628211)


def fingerprint_batch(tbl: pa.Table) -> pa.Table:
    """64-bit polynomial rolling-hash fingerprint of the raw utf8 text bytes:
    h = B^L + sum_k b_k * B^(L-1-k)  (mod 2^64).

    Fully vectorized over the zero-copy Arrow string buffer: rows are
    LEFT-padded into an (N, Lmax) byte matrix (leading zeros contribute
    nothing), powers of B come from one accumulated product, and the matrix
    reduction is a single uint64 multiply+sum with natural mod-2^64 wrap.
    """
    col = tbl["text"].combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    n = len(arr)
    lens = offsets[1:] - offsets[:-1]
    lmax = int(lens.max()) if n else 0
    padded = np.zeros((n, lmax), dtype=np.uint64)
    # scatter each row's bytes right-aligned
    col_idx = np.arange(lmax)
    mask = col_idx[None, :] >= (lmax - lens)[:, None]
    flat_src = np.empty(int(lens.sum()), dtype=np.uint8)
    pos = 0
    for i in range(n):  # cheap: one slice copy per row, no per-byte work
        flat_src[pos : pos + lens[i]] = data[offsets[i] : offsets[i + 1]]
        pos += lens[i]
    padded[mask] = flat_src
    with np.errstate(over="ignore"):
        # powers[k] = B^(lmax-1-k), mod 2^64
        acc = np.multiply.accumulate(np.full(max(lmax, 1), _FP_BASE, dtype=np.uint64))
        powers = np.empty(lmax, dtype=np.uint64)
        if lmax:
            powers[lmax - 1] = np.uint64(1)
            powers[: lmax - 1] = acc[: lmax - 1][::-1]
        fps = (padded * powers[None, :]).sum(axis=1, dtype=np.uint64)
        # + B^L length term (acc[L-1] = B^L)
        fps += np.where(lens > 0, acc[np.maximum(lens, 1) - 1], np.uint64(1))
    return pa.table(
        {"doc_id": tbl["doc_id"], "fingerprint": pa.array(fps.view(np.int64))}
    )


def fingerprint_query(sf_dir: str):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", batch_size=None)

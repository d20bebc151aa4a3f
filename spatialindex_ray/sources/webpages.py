"""Deterministic Common-Crawl-style webpage table synthesis (FIXTURES.md §1).

Schema (BASELINE.json input_hint): url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string. Everything is a pure function of the
row index / url, so any partition can be regenerated idempotently — the
property the resume/checkpoint path and Ray lineage retries rely on.

A configurable fraction of rows reuses a small hot-host URL set (duplicated
urls => identical sha1-derived sky positions => dense cells) to exercise the
hot-cell salting path.

Fully vectorized as of round 2: one batched SHA-1 (kernels/hashing.py) per
batch, html/text built by flat-buffer gather (no per-row Python beyond url
f-strings) — byte-identical to the round-1 per-row implementation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import hashing

LANGS = ["en", "de", "fr", "es", "zh"]
EPOCH_2025 = 1735689600_000000  # 2025-01-01T00:00:00 in us

N_HOT_HOSTS = 5
N_HOT_PATHS = 50

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _urls_for(indices: np.ndarray, hot_frac: float) -> list[str]:
    hot_mod = int(1.0 / hot_frac) if hot_frac > 0 else 0
    urls = []
    for i in indices.tolist():
        if hot_mod and (i % hot_mod) == 0:
            j = i // hot_mod  # dense index over hot rows only — otherwise the
            # modulus correlates with i and all hot rows collapse to one url
            urls.append(
                f"https://hot{j % N_HOT_HOSTS}.example/"
                f"{(j // N_HOT_HOSTS) % N_HOT_PATHS:04d}"
            )
        else:
            urls.append(f"https://site{i % 1000}.example/{i:08d}")
    return urls


ALL_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def synth_batch(
    indices: np.ndarray, hot_frac: float = 0.0, columns=None
) -> pa.Table:
    """Generate webpage rows for the given global row indices.

    Per-row rules (byte-identical to round 1):
      d = sha1(url); length = 200 + (be16(d[16:18]) % 1801)
      html = tile(d)[:length]; text = html.hex()[:length // 2]
      lang = LANGS[i % 5]; warc_ts = 2025-01-01 + i seconds

    ``columns`` prunes generation at the source (the synthetic analog of
    parquet column pushdown): html+text are ~1.1 KB/row, so an encode-only
    pipeline that materializes them just to project them away moves ~20x
    more memory than it needs.
    """
    cols_wanted = ALL_COLUMNS if columns is None else tuple(columns)
    n = len(indices)
    urls = _urls_for(indices, hot_frac)
    if not ({"html", "text"} & set(cols_wanted)):
        out = {}
        for c in cols_wanted:
            if c == "url":
                out[c] = pa.array(urls, type=pa.string())
            elif c == "warc_ts":
                ts = EPOCH_2025 + np.asarray(indices, dtype=np.int64) * 1_000_000
                out[c] = pa.array(ts, type=pa.timestamp("us"))
            elif c == "lang":
                langs = np.array(LANGS)[
                    np.asarray(indices, dtype=np.int64) % len(LANGS)
                ]
                out[c] = pa.array(langs, type=pa.string())
        return pa.table(out)
    enc = [u.encode() for u in urls]
    u_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(b) for b in enc], out=u_offsets[1:])
    u_data = (
        np.frombuffer(b"".join(enc), dtype=np.uint8)
        if n
        else np.empty(0, dtype=np.uint8)
    )
    d = hashing.sha1_digest_bytes(u_data, u_offsets)  # (N, 20)

    length = 200 + (
        (d[:, 16].astype(np.int64) << 8 | d[:, 17].astype(np.int64)) % 1801
    ).astype(np.int32)
    # html: digest tiled to `length` bytes. All index math in int32 with
    # fused flat gathers — batch temporaries stay ~5x the output bytes
    # (large fresh allocations intermittently stall 10-100x in this sandbox
    # when the host is reclaiming memory; small is also right at scale).
    length = length.astype(np.int32)
    h_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(length, out=h_off[1:])
    total = int(h_off[-1])
    dflat = np.ascontiguousarray(d).reshape(-1)
    within = np.arange(total, dtype=np.int32)
    within -= np.repeat(h_off[:-1], length)
    flat_idx = np.repeat(
        np.arange(n, dtype=np.int32) * np.int32(20), length
    )
    flat_idx += within % np.int32(20)
    html_flat = dflat[flat_idx]
    del flat_idx
    html_arr = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(h_off), pa.py_buffer(html_flat)],
    )
    # text: hex(html)[: length // 2] — char p is the hi/lo nibble of html
    # byte p // 2, rendered through a hex LUT
    tlen = length // np.int32(2)
    t_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(tlen, out=t_off[1:])
    t_total = int(t_off[-1])
    t_within = np.arange(t_total, dtype=np.int32)
    t_within -= np.repeat(t_off[:-1], tlen)
    t_idx = np.repeat(np.arange(n, dtype=np.int32) * np.int32(20), tlen)
    t_idx += (t_within >> np.int32(1)) % np.int32(20)
    src_byte = dflat[t_idx]
    del t_idx
    # hi nibble for even positions, lo for odd: one gather + shift select
    shift = ((~t_within) & np.int32(1)) << np.int32(2)
    text_flat = _HEX[(src_byte >> shift.astype(np.uint8)) & np.uint8(15)]
    text_arr = pa.Array.from_buffers(
        pa.string(),
        n,
        [None, pa.py_buffer(t_off), pa.py_buffer(text_flat)],
    )
    langs = np.array(LANGS)[np.asarray(indices, dtype=np.int64) % len(LANGS)]
    ts = EPOCH_2025 + np.asarray(indices, dtype=np.int64) * 1_000_000
    full = {
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": html_arr,
        "text": text_arr,
        "lang": pa.array(langs, type=pa.string()),
    }
    return pa.table({c: full[c] for c in cols_wanted})


def synth_webpages(
    n_rows: int,
    *,
    hot_frac: float = 0.02,
    override_num_blocks=None,
    columns=None,
):
    """Dataset of n_rows synthetic pages; generation itself runs distributed
    (ray.data.range -> map_batches), so no driver-side materialization.
    ``columns`` prunes generation at the source (see synth_batch).

    Block sizing: ~50k rows per block (bounded to [8, 1024] blocks) — small
    enough to pipeline/spill, large enough that per-task scheduling overhead
    is amortized (1538-row blocks measured 10x slower end-to-end)."""
    import ray

    if override_num_blocks is None:
        override_num_blocks = max(8, min(1024, n_rows // 16_000))
    ds = ray.data.range(n_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return synth_batch(batch["id"].to_numpy(), hot_frac=hot_frac, columns=columns)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)

"""Deterministic Common-Crawl-style webpage table synthesis (FIXTURES.md §1).

Schema (BASELINE.json input_hint): url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string. Everything is a pure function of the
row index / url, so any partition can be regenerated idempotently — the
property the resume/checkpoint path and Ray lineage retries rely on.

A configurable fraction of rows reuses a small hot-host URL set (duplicated
urls => identical sha1-derived sky positions => dense cells) to exercise the
hot-cell salting path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["en", "de", "fr", "es", "zh"]
EPOCH_2025 = 1735689600_000000  # 2025-01-01T00:00:00 in us

N_HOT_HOSTS = 5
N_HOT_PATHS = 50


def synth_batch(indices: np.ndarray, hot_frac: float = 0.0) -> pa.Table:
    """Generate webpage rows for the given global row indices."""
    n = len(indices)
    urls = []
    htmls = []
    texts = []
    langs = []
    hot_mod = int(1.0 / hot_frac) if hot_frac > 0 else 0
    for i in indices.tolist():
        if hot_mod and (i % hot_mod) == 0:
            j = i // hot_mod  # dense index over hot rows only — otherwise the
            # modulus correlates with i and all hot rows collapse to one url
            u = f"https://hot{j % N_HOT_HOSTS}.example/{(j // N_HOT_HOSTS) % N_HOT_PATHS:04d}"
        else:
            u = f"https://site{i % 1000}.example/{i:08d}"
        urls.append(u)
        d = hashlib.sha1(u.encode()).digest()
        length = 200 + (int.from_bytes(d[16:18], "big") % 1801)
        html = (d * ((length // 20) + 1))[:length]
        htmls.append(html)
        # deterministic "extracted text" — must stay byte-identical per url
        # through every engine stage
        texts.append(html.hex()[: length // 2])
        langs.append(LANGS[i % len(LANGS)])
    ts = (EPOCH_2025 + indices.astype(np.int64) * 1_000_000)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def synth_webpages(n_rows: int, *, hot_frac: float = 0.02, override_num_blocks=None):
    """Dataset of n_rows synthetic pages; generation itself runs distributed
    (ray.data.range -> map_batches), so no driver-side materialization.

    Block sizing: ~50k rows per block (bounded to [8, 1024] blocks) — small
    enough to pipeline/spill, large enough that per-task scheduling overhead
    is amortized (1538-row blocks measured 10x slower end-to-end)."""
    import ray

    if override_num_blocks is None:
        override_num_blocks = max(8, min(1024, n_rows // 16_000))
    ds = ray.data.range(n_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return synth_batch(batch["id"].to_numpy(), hot_frac=hot_frac)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)

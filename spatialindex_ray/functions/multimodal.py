"""Multimodal column operators: image/audio/video handled as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBS (no image/audio libraries in this
environment — see DecodeImage.__init__), but all the Ray-side plumbing is
real and tested: actor-pool map_batches signatures, small-batch sizing for
large binary payloads, schema handling, and deterministic fake feature
extraction so downstream stages (dedup, ANN over features) can run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _binary_buffers(col):
    """Zero-copy (offsets, data) view of a binary/string column."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return off, data


class DecodeImage:
    """Actor-pool stage: binary payload -> (width, height, channels) +
    feature vector. Real decoders (PIL / libjpeg) are not available in this
    container; the decode step is a deterministic fake that parses
    pseudo-header bytes — swap `_decode` for a real implementation.

    Usage: ds.map_batches(DecodeImage, concurrency=N, batch_size=256,
    num_cpus=1) — small batches because payloads are large; decoder state
    (here: the feature projection matrix) loads once per actor.
    """

    FEATURE_DIM = 32

    def __init__(self, feature_dim: int = FEATURE_DIM):
        try:
            import PIL.Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False
        self.feature_dim = feature_dim
        # deterministic projection "model" loaded once per actor
        rng = np.random.RandomState(424242)
        self.proj = rng.normal(size=(256, feature_dim)).astype(np.float32)

    def _decode(self, payload_off, payload_data, i):
        if self._real:  # pragma: no cover - not reachable in this container
            raise NotImplementedError("real decoder wiring goes here")
        lo, hi = payload_off[i], payload_off[i + 1]
        raw = payload_data[lo:hi]
        # deterministic fake: derive dims from the first bytes
        w = 64 + int(raw[0]) if len(raw) else 0
        h = 64 + int(raw[1]) if len(raw) > 1 else 0
        c = 3
        return w, h, c, raw

    def __call__(self, tbl: pa.Table) -> pa.Table:
        off, data = _binary_buffers(tbl["html"] if "html" in tbl.column_names else tbl["payload"])
        n = len(tbl)
        ws = np.zeros(n, dtype=np.int32)
        hs = np.zeros(n, dtype=np.int32)
        cs = np.zeros(n, dtype=np.int32)
        feats = np.zeros((n, self.feature_dim), dtype=np.float32)
        for i in range(n):
            w, h, c, raw = self._decode(off, data, i)
            ws[i], hs[i], cs[i] = w, h, c
            # byte-histogram "features" projected by the per-actor model
            hist = np.bincount(raw, minlength=256).astype(np.float32)
            norm = np.linalg.norm(hist)
            if norm > 0:
                hist /= norm
            feats[i] = hist @ self.proj
        cols = {name: tbl[name] for name in tbl.column_names if name not in ("html", "payload")}
        cols.update(
            {
                "width": pa.array(ws),
                "height": pa.array(hs),
                "channels": pa.array(cs),
                "features": pa.array(list(feats), type=pa.list_(pa.float32(), self.feature_dim)),
            }
        )
        return pa.table(cols)


class ResizeImage:
    """Actor-pool resize stage (stub decode; real layout). Emits a binary
    column of the 'resized' payload with deterministic target size."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, tbl: pa.Table) -> pa.Table:
        col = "html" if "html" in tbl.column_names else "payload"
        off, data = _binary_buffers(tbl[col])
        out = []
        for i in range(len(tbl)):
            raw = data[off[i] : off[i + 1]]
            k = max(1, len(raw) // self.target)
            out.append(raw[::k][: self.target].tobytes())  # "resample"
        cols = {name: tbl[name] for name in tbl.column_names}
        cols["resized"] = pa.array(out, type=pa.binary())
        return pa.table(cols)


class SampleFrames:
    """Video frame-sampling stage stub: treats the payload as a concatenated
    frame stream and emits every k-th 'frame' slice as a list<binary>."""

    def __init__(self, frame_bytes: int = 64, every: int = 10):
        self.frame_bytes = frame_bytes
        self.every = every

    def __call__(self, tbl: pa.Table) -> pa.Table:
        col = "html" if "html" in tbl.column_names else "payload"
        off, data = _binary_buffers(tbl[col])
        frames = []
        counts = np.zeros(len(tbl), dtype=np.int64)
        for i in range(len(tbl)):
            raw = data[off[i] : off[i + 1]]
            n_frames = len(raw) // self.frame_bytes
            picked = [
                raw[j * self.frame_bytes : (j + 1) * self.frame_bytes].tobytes()
                for j in range(0, n_frames, self.every)
            ]
            counts[i] = len(picked)
            frames.append(picked)
        cols = {name: tbl[name] for name in tbl.column_names if name != col}
        cols["frames"] = pa.array(frames, type=pa.list_(pa.binary()))
        cols["n_frames"] = pa.array(counts)
        return pa.table(cols)


def image_features_query(sf_dir: str):
    """Pipeline entry: synthesize webpage payloads sized from the documents
    table, run the DecodeImage actor pool, return (url, width, height,
    n_features). Rows-only check (stubbed decode has no SQL equivalent)."""
    import pyarrow.parquet as pq

    import ray

    from ..sources import webpages

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    pages = webpages.synth_webpages(n, hot_frac=0.0)
    decoded = pages.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=256,      # large binary payloads -> small batches
        concurrency=2,
        num_cpus=1,
    )

    def project(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": tbl["url"],
                "width": tbl["width"],
                "height": tbl["height"],
                "n_features": pa.array(
                    np.full(len(tbl), DecodeImage.FEATURE_DIM, dtype=np.int64)
                ),
            }
        )

    return decoded.map_batches(project, batch_format="pyarrow", batch_size=None)

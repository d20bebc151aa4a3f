"""Multimodal column operators: image/audio/video handled as opaque binary
columns with typed metadata.

PNG payloads are decoded FOR REAL by a pure stdlib+NumPy decoder below
(zlib inflate + scanline unfiltering; 8-bit gray/RGB/RGBA, non-interlaced —
the overwhelmingly common case), with a matching encoder for tests. Other
formats (JPEG etc. — no libjpeg/PIL in this container) fall back to a
clearly-documented deterministic fake, so all the Ray-side plumbing
(actor-pool map_batches signatures, small-batch sizing for large binary
payloads, schema handling, feature extraction) is real and tested either
way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples/pixel


def decode_png(raw: bytes):
    """Minimal real PNG decoder: returns (height, width, channels,
    (H, W, C) uint8 pixels). Supports bit depth 8, colortypes 0/2/4/6,
    no interlace. Raises ValueError on anything else."""
    if bytes(raw[:8]) != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = None
    idat = []
    n = len(raw)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", bytes(raw[pos : pos + 4]))
        tag = bytes(raw[pos + 4 : pos + 8])
        body = bytes(raw[pos + 8 : pos + 8 + length])
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    c = _PNG_CHANNELS[ctype]
    stride = w * c
    dec = zlib.decompress(b"".join(idat))
    if len(dec) != h * (stride + 1):
        raise ValueError("bad PNG data size")
    rows = np.frombuffer(dec, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    with np.errstate(over="ignore"):
        for y in range(h):
            cur = rows[y, 1:].copy()
            f = filters[y]
            prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            if f == 0:
                out[y] = cur
            elif f == 1:  # Sub: cumulative along x per channel offset
                px = cur.reshape(w, c)
                np.add.accumulate(px, axis=0, out=px)
                out[y] = px.reshape(stride)
            elif f == 2:  # Up
                out[y] = cur + prev
            elif f == 3:  # Average — sequential in x
                for x in range(stride):
                    left = int(out[y, x - c]) if x >= c else 0
                    out[y, x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            elif f == 4:  # Paeth — sequential in x
                for x in range(stride):
                    a = int(out[y, x - c]) if x >= c else 0
                    b = int(prev[x])
                    cc = int(prev[x - c]) if x >= c else 0
                    p = a + b - cc
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
                    out[y, x] = (int(cur[x]) + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter {f}")
    return h, w, c, out.reshape(h, w, c)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 rows) for (H, W, C) uint8 arrays,
    C in {1, 3, 4} — the test/reference dual of decode_png."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * c)], axis=1
    )
    body = zlib.compress(scan.tobytes(), 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


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
    feature vector. PNG payloads decode for real (decode_png above); other
    formats (no libjpeg/PIL in this container) use a deterministic fake
    that parses pseudo-header bytes — swap the fallback for a real JPEG
    implementation when the library exists.

    Usage: ds.map_batches(DecodeImage, concurrency=N, batch_size=256,
    num_cpus=1) — small batches because payloads are large; decoder state
    (here: the feature projection matrix) loads once per actor.
    """

    FEATURE_DIM = 32

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        # deterministic projection "model" loaded once per actor
        rng = np.random.RandomState(424242)
        self.proj = rng.normal(size=(256, feature_dim)).astype(np.float32)

    def _decode(self, payload_off, payload_data, i):
        lo, hi = payload_off[i], payload_off[i + 1]
        raw = payload_data[lo:hi]
        if bytes(raw[:8]) == _PNG_MAGIC:
            try:
                h, w, c, px = decode_png(raw)
                return w, h, c, px.reshape(-1)
            except ValueError:
                pass  # corrupt/unsupported variant -> fallback below
        # deterministic fake for non-PNG payloads: derive dims from the
        # first bytes, features from the raw byte histogram
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


_WAV_FORMATS = {1: "pcm", 3: "float"}


def decode_wav(raw: bytes):
    """Minimal real WAV decoder: RIFF/WAVE with PCM (8/16/32-bit int) or
    float32 samples. Returns (sample_rate, n_channels, (frames, channels)
    float32 samples in [-1, 1]). Raises ValueError otherwise."""
    raw = bytes(raw)
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        tag = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("truncated WAV")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format not in _WAV_FORMATS or channels == 0:
        raise ValueError("unsupported WAV format")
    if audio_format == 3:
        if bits != 32:
            raise ValueError("unsupported float depth")
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError("unsupported PCM depth")
    frames = len(x) // channels
    return rate, channels, x[: frames * channels].reshape(frames, channels)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """16-bit PCM WAV encoder for (frames,) or (frames, channels) float
    samples in [-1, 1] — the test dual of decode_wav."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    frames, channels = x.shape
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


class DecodeAudio:
    """Actor-pool stage: audio payload -> (sample_rate, n_channels,
    duration_s) + spectral features. WAV payloads decode for real
    (decode_wav); other codecs (no libsndfile/ffmpeg here) fall back to a
    deterministic fake. Feature vector: [rms, zero-crossing rate] + N-band
    log-magnitude spectrum of the mono mix (numpy rfft, loaded-once state).
    """

    N_BANDS = 16

    def __init__(self, n_bands: int = N_BANDS):
        self.n_bands = n_bands

    def _features(self, mono: np.ndarray) -> np.ndarray:
        out = np.zeros(2 + self.n_bands, dtype=np.float32)
        if len(mono) == 0:
            return out
        out[0] = float(np.sqrt(np.mean(mono * mono)))
        out[1] = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        spec = np.abs(np.fft.rfft(mono[: 1 << 14]))
        bands = np.array_split(spec, self.n_bands)
        out[2:] = [np.log1p(float(b.mean())) if len(b) else 0.0 for b in bands]
        return out

    def __call__(self, tbl: pa.Table) -> pa.Table:
        col = "audio" if "audio" in tbl.column_names else "payload"
        off, data = _binary_buffers(tbl[col])
        n = len(tbl)
        rates = np.zeros(n, dtype=np.int32)
        chans = np.zeros(n, dtype=np.int32)
        durs = np.zeros(n, dtype=np.float64)
        feats = np.zeros((n, 2 + self.n_bands), dtype=np.float32)
        for i in range(n):
            raw = data[off[i] : off[i + 1]]
            try:
                rate, ch, samples = decode_wav(raw)
                rates[i], chans[i] = rate, ch
                durs[i] = samples.shape[0] / rate if rate else 0.0
                feats[i] = self._features(samples.mean(axis=1))
            except ValueError:
                # deterministic fallback for non-WAV payloads
                rates[i] = 16000
                chans[i] = 1
                durs[i] = len(raw) / 32000.0
                feats[i] = self._features(
                    (raw[: 1 << 14].astype(np.float32) - 128.0) / 128.0
                )
        cols = {name: tbl[name] for name in tbl.column_names if name != col}
        cols.update(
            {
                "sample_rate": pa.array(rates),
                "n_channels": pa.array(chans),
                "duration_s": pa.array(durs),
                "audio_features": pa.array(
                    list(feats), type=pa.list_(pa.float32(), 2 + self.n_bands)
                ),
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
    """End-to-end image pipeline over REAL PNG payloads: synthesize one
    deterministic constant-color PNG per doc (encode_png — width/height/
    color all SQL-expressible functions of doc_id), decode + featurize in
    the DecodeImage actor pool, then verify the decoded byte histogram
    against an independently constructed copy of the actor's projection
    model (px_ok): a constant-color image yields a one-hot normalized
    histogram, so features must equal proj[doc_id % 256] exactly — any
    pixel corruption in the codec roundtrip flips px_ok. Fully oracled
    (IMAGE_FEATURES_ORACLE)."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids:
            w = 8 + int(did) % 24
            h = 8 + (int(did) % 7) * 3
            v = int(did) % 256
            payloads.append(encode_png(np.full((h, w, 3), v, dtype=np.uint8)))
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    decoded = ds.map_batches(
        synth, batch_format="pyarrow", batch_size=None
    ).map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=256,      # large binary payloads -> small batches
        concurrency=2,
        num_cpus=1,
    )

    # independent copy of the actor's deterministic projection "model"
    proj = (
        np.random.RandomState(424242)
        .normal(size=(256, DecodeImage.FEATURE_DIM))
        .astype(np.float32)
    )

    def project(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        feats = (
            tbl["features"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(len(tbl), DecodeImage.FEATURE_DIM)
        )
        ok = np.all(feats == proj[ids % 256], axis=1)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "width": tbl["width"],
                "height": tbl["height"],
                "channels": tbl["channels"],
                "px_ok": pa.array(ok),
            }
        )

    return decoded.map_batches(project, batch_format="pyarrow", batch_size=None)


IMAGE_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(8 + doc_id % 24 AS INTEGER) AS width,
       CAST(8 + (doc_id % 7) * 3 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(TRUE AS BOOLEAN) AS px_ok
FROM documents
"""


VIDEO_FRAME_BYTES = 64
VIDEO_EVERY = 10


def video_frames_query(sf_dir: str):
    """Video frame-sampling pipeline: deterministic synthetic frame-stream
    payloads (length 256 + doc_id % 1000 bytes) through the SampleFrames
    actor pool; returns (doc_id, n_frames). The sampling arithmetic
    n_frames = ceil((len // frame_bytes) / every) is SQL-expressible, so the
    distributed plumbing gets a real oracle even though the 'codec' is a
    documented stub (no video libs in this environment)."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        lengths = (256 + ids % 1000).astype(np.int64)
        # one flat deterministic buffer, sliced per row (no per-row RNG)
        total = int(lengths.sum())
        flat = (np.arange(total, dtype=np.int64) % 251).astype(np.uint8)
        offs = np.concatenate([[0], np.cumsum(lengths)])
        payloads = [flat[offs[i]:offs[i + 1]].tobytes() for i in range(len(ids))]
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    sampled = ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        SampleFrames,
        fn_constructor_kwargs={"frame_bytes": VIDEO_FRAME_BYTES, "every": VIDEO_EVERY},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": tbl["doc_id"], "n_frames": tbl["n_frames"].cast(pa.int64())}
        )

    return sampled.map_batches(project, batch_format="pyarrow", batch_size=None)


VIDEO_FRAMES_ORACLE = f"""
SELECT doc_id,
  CAST(ceil(((256 + doc_id % 1000) // {VIDEO_FRAME_BYTES}) / {VIDEO_EVERY}.0)
       AS BIGINT) AS n_frames
FROM documents
"""


class TileStats:
    """Actor-pool stage: PNG payload -> per-quadrant integer pixel sums
    (channel 0). The spatial-analytics counterpart of DecodeImage: decode
    once per image, then 2x2 quadrant sums via array slicing — the shape a
    real vision-preproc pipeline uses for region pooling. Exact integers,
    so the distributed result hashes against SQL."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_qy, out_qx, out_sum, out_n = [], [], [], [], []
        for i, did in enumerate(ids):
            raw = payload[i].as_py()
            h, w, c, px = decode_png(raw)
            g = px[:, :, 0].astype(np.int64)
            hy, wx = h // 2, w // 2
            for qy, (y0, y1) in enumerate(((0, hy), (hy, h))):
                for qx, (x0, x1) in enumerate(((0, wx), (wx, w))):
                    blk = g[y0:y1, x0:x1]
                    out_id.append(did); out_qy.append(qy); out_qx.append(qx)
                    out_sum.append(int(blk.sum())); out_n.append(blk.size)
        return pa.table(
            {
                "doc_id": pa.array(np.array(out_id, dtype=np.int64)),
                "qy": pa.array(np.array(out_qy, dtype=np.int64)),
                "qx": pa.array(np.array(out_qx, dtype=np.int64)),
                "px_sum": pa.array(np.array(out_sum, dtype=np.int64)),
                "n_px": pa.array(np.array(out_n, dtype=np.int64)),
            }
        )


def _synth_gradient_pngs(tbl: pa.Table) -> pa.Table:
    """Deterministic REAL-codec image payloads: pixel (y, x) = (doc_id + x
    + y) % 256 in every channel, w = 8 + doc_id % 24, h = 8 + (doc_id % 7)
    * 3 — the whole image is SQL-reconstructible, so ops over an actual
    PNG roundtrip get exact oracles."""
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    payloads = []
    for did in ids:
        w = 8 + int(did) % 24
        h = 8 + (int(did) % 7) * 3
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((int(did) + xx + yy) % 256).astype(np.uint8)
        payloads.append(encode_png(np.repeat(g[:, :, None], 3, axis=2)))
    return pa.table(
        {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
    )


def image_tile_stats_query(sf_dir: str):
    """Per-quadrant pixel sums over REAL gradient PNGs (see
    _synth_gradient_pngs): region pooling over an actual codec roundtrip
    with an exact oracle (IMAGE_TILE_STATS_ORACLE)."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    return ds.map_batches(
        _synth_gradient_pngs, batch_format="pyarrow", batch_size=None
    ).map_batches(
        TileStats,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


IMAGE_TILE_STATS_ORACLE = """
WITH q AS (SELECT * FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) t(qy, qx)),
d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id % 7) * 3 AS h
      FROM documents),
cells AS (
  SELECT d.doc_id, q.qy, q.qx,
         CASE WHEN q.qy = 0 THEN 0 ELSE h // 2 END AS y0,
         CASE WHEN q.qy = 0 THEN h // 2 ELSE h END AS y1,
         CASE WHEN q.qx = 0 THEN 0 ELSE w // 2 END AS x0,
         CASE WHEN q.qx = 0 THEN w // 2 ELSE w END AS x1
  FROM d CROSS JOIN q)
SELECT doc_id, CAST(qy AS BIGINT) AS qy, CAST(qx AS BIGINT) AS qx,
       CAST(sum((doc_id + xs.x + ys.y) % 256) AS BIGINT) AS px_sum,
       CAST(count(*) AS BIGINT) AS n_px
FROM cells, unnest(range(y0, y1)) AS ys(y), unnest(range(x0, x1)) AS xs(x)
GROUP BY 1, 2, 3
"""


AUDIO_WIN = 400
AUDIO_LEN = 1600


class WindowEnergy:
    """Actor-pool stage: WAV payload -> exact integer energy per fixed
    window (sum of squared int16 samples). The audio analog of TileStats:
    decode once, then a reshape + one vectorized square-sum per window —
    the region-pooling shape of a real audio-preproc stage, in exact
    integers so it hashes against SQL."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_w, out_e = [], [], []
        for i, did in enumerate(ids):
            rate, ch, x = decode_wav(payload[i].as_py())
            k = np.round(x[:, 0].astype(np.float64) * 32768.0).astype(np.int64)
            n_win = len(k) // AUDIO_WIN
            e = (k[: n_win * AUDIO_WIN].reshape(n_win, AUDIO_WIN) ** 2).sum(axis=1)
            out_id.append(np.full(n_win, did, dtype=np.int64))
            out_w.append(np.arange(n_win, dtype=np.int64))
            out_e.append(e)
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "win": pa.array([], pa.int64()),
                             "energy": pa.array([], pa.int64())})
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "win": pa.array(np.concatenate(out_w)),
                "energy": pa.array(np.concatenate(out_e)),
            }
        )


def audio_window_energy_query(sf_dir: str):
    """Windowed audio energy over REAL WAV payloads: integer sawtooth
    samples k(n) = ((doc_id*7 + n) % 200) - 100 quantize exactly through
    the 16-bit PCM encode -> decode roundtrip, so per-window sum(k^2) has
    an exact SQL dual (AUDIO_WINDOW_ENERGY_ORACLE) — codec + pooling both
    verified."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = np.arange(AUDIO_LEN, dtype=np.int64)
        payloads = []
        for did in ids:
            k = ((int(did) * 7 + n) % 200) - 100
            payloads.append(encode_wav(k / 32767.0, rate=8000))
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        WindowEnergy,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


class ZeroCross:
    """Actor-pool stage: WAV payload -> per-window zero-crossing count
    (positions p with sample(p-1) * sample(p) < 0, windowed by the position
    of p) — the classic voiced/unvoiced + percussiveness feature, exact in
    integers through the PCM roundtrip."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_w, out_z = [], [], []
        for i, did in enumerate(ids):
            rate, ch, x = decode_wav(payload[i].as_py())
            k = np.round(x[:, 0].astype(np.float64) * 32768.0).astype(np.int64)
            cross = (k[:-1] * k[1:]) < 0
            pos = np.arange(1, len(k), dtype=np.int64)
            win = pos // AUDIO_WIN
            n_win = len(k) // AUDIO_WIN
            z = np.bincount(win[cross], minlength=n_win)[:n_win]
            out_id.append(np.full(n_win, did, dtype=np.int64))
            out_w.append(np.arange(n_win, dtype=np.int64))
            out_z.append(z.astype(np.int64))
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "win": pa.array([], pa.int64()),
                             "n_cross": pa.array([], pa.int64())})
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "win": pa.array(np.concatenate(out_w)),
                "n_cross": pa.array(np.concatenate(out_z)),
            }
        )


def audio_zcr_query(sf_dir: str):
    """Per-window zero-crossing rate over the same REAL WAV sawtooth
    payloads as audio_window_energy — decode + sign-product count in an
    actor pool, bit-exact against AUDIO_ZCR_ORACLE."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = np.arange(AUDIO_LEN, dtype=np.int64)
        payloads = []
        for did in ids:
            k = ((int(did) * 7 + n) % 200) - 100
            payloads.append(encode_wav(k / 32767.0, rate=8000))
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        ZeroCross,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


AUDIO_ZCR_ORACLE = f"""
WITH s AS (
  SELECT doc_id, n,
         ((doc_id * 7 + n) % 200 - 100) AS k,
         ((doc_id * 7 + n - 1) % 200 - 100) AS kp
  FROM documents, unnest(range(1, {AUDIO_LEN})) AS t(n))
SELECT doc_id, CAST(n // {AUDIO_WIN} AS BIGINT) AS win,
       CAST(sum(CASE WHEN k * kp < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
FROM s GROUP BY 1, 2
"""


AUDIO_WINDOW_ENERGY_ORACLE = f"""
SELECT doc_id, CAST(n // {AUDIO_WIN} AS BIGINT) AS win,
       CAST(sum(((doc_id * 7 + n) % 200 - 100) * ((doc_id * 7 + n) % 200 - 100))
            AS BIGINT) AS energy
FROM documents, unnest(range(0, {AUDIO_LEN})) AS t(n)
GROUP BY 1, 2
"""


AUDIO_GAIN_TARGET_E = AUDIO_LEN * 50 * 50  # normalize to rms ~ 50 LSB


class GainTable:
    """Actor-pool stage: WAV payload -> loudness-normalization gain. The
    gain lives in the SQUARED domain to stay integer-exact (no sqrt):
    gain2_ppm = 1e6 * target_energy // energy — the per-clip scalar an
    audio-normalize stage multiplies by. Decode once per clip, one
    square-sum; emits (doc_id, energy, gain2_ppm)."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        energy = np.zeros(len(ids), np.int64)
        for i in range(len(ids)):
            rate, ch, x = decode_wav(payload[i].as_py())
            k = np.round(x[:, 0].astype(np.float64) * 32768.0).astype(np.int64)
            energy[i] = int((k * k).sum())
        gain = np.where(
            energy > 0, 1_000_000 * AUDIO_GAIN_TARGET_E // np.maximum(energy, 1), 0
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "energy": pa.array(energy),
                "gain2_ppm": pa.array(gain.astype(np.int64)),
            }
        )


def audio_gain_query(sf_dir: str):
    """Loudness-normalization gain table over REAL WAV payloads (same
    sawtooth synthesis as audio_window_energy): decode + integer energy in
    an actor pool, squared-domain gain so the SQL dual is exact."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = np.arange(AUDIO_LEN, dtype=np.int64)
        payloads = []
        for did in ids:
            k = ((int(did) * 7 + n) % 200) - 100
            payloads.append(encode_wav(k / 32767.0, rate=8000))
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        GainTable,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


AUDIO_GAIN_ORACLE = f"""
WITH e AS (
  SELECT doc_id,
    sum(((doc_id * 7 + n) % 200 - 100) * ((doc_id * 7 + n) % 200 - 100))
      AS energy
  FROM documents, unnest(range(0, {AUDIO_LEN})) AS t(n)
  GROUP BY 1)
SELECT doc_id, CAST(energy AS BIGINT) AS energy,
  CAST(CASE WHEN energy > 0
       THEN CAST(1000000 AS BIGINT) * {AUDIO_GAIN_TARGET_E} // energy
       ELSE 0 END AS BIGINT) AS gain2_ppm
FROM e
"""


class AHash:
    """Actor-pool stage: PNG payload -> 64-bit average hash (the classic
    image near-dup fingerprint): the image is pooled to an 8x8 grid of
    integer block sums (integral-image corner arithmetic, one vectorized
    pass per image) and bit (by, bx) is set when its block mean exceeds
    the global mean — compared EXACTLY via the cross-multiplication
    block_sum * total_n > total_sum * block_n, so the distributed result
    hashes against SQL despite the codec roundtrip. Bits pack little-index
    -first into a uint64 viewed as int64."""

    _IDX = (np.arange(8)[:, None] * 8 + np.arange(8)[None, :]).astype(np.uint64)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out = np.empty(len(ids), dtype=np.uint64)
        for i in range(len(ids)):
            raw = payload[i].as_py()
            h, w, c, px = decode_png(raw)
            g = px[:, :, 0].astype(np.int64)
            ii = np.zeros((h + 1, w + 1), dtype=np.int64)
            np.cumsum(np.cumsum(g, axis=0), axis=1, out=ii[1:, 1:])
            ys = (np.arange(9) * h) // 8
            xs = (np.arange(9) * w) // 8
            corners = ii[np.ix_(ys, xs)]
            bs = (
                corners[1:, 1:] - corners[:-1, 1:]
                - corners[1:, :-1] + corners[:-1, :-1]
            )
            bn = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
            ts, tn = int(ii[h, w]), h * w
            bits = (bs * tn > ts * bn).astype(np.uint64)
            out[i] = (bits << self._IDX).sum(dtype=np.uint64)
        return pa.table(
            {"doc_id": pa.array(ids), "ahash": pa.array(out.view(np.int64))}
        )


def image_ahash_query(sf_dir: str):
    """64-bit average-hash fingerprints over REAL gradient PNGs (see
    _synth_gradient_pngs) — the multimodal near-dup key: identical gradient
    patterns (same dims + same doc_id % 256 phase) collide, so grouping by
    ahash IS the image-dedup bucketing. Exact-integer construction gives it
    a full SQL oracle even through the codec roundtrip."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        _synth_gradient_pngs, batch_format="pyarrow", batch_size=None
    ).map_batches(
        AHash,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


IMAGE_AHASH_ORACLE = """
WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id % 7) * 3 AS h
           FROM documents),
tot AS (SELECT doc_id, sum((doc_id + xs.x + ys.y) % 256) AS ts, count(*) AS tn
        FROM d, unnest(range(0, h)) ys(y), unnest(range(0, w)) xs(x)
        GROUP BY doc_id),
blk AS (SELECT d.doc_id, byi.by, bxi.bx,
          sum((doc_id + xs.x + ys.y) % 256) AS bs, count(*) AS bn
        FROM d, unnest(range(0, 8)) byi(by), unnest(range(0, 8)) bxi(bx),
             unnest(range(byi.by * h // 8, (byi.by + 1) * h // 8)) ys(y),
             unnest(range(bxi.bx * w // 8, (bxi.bx + 1) * w // 8)) xs(x)
        GROUP BY 1, 2, 3),
bits AS (SELECT blk.doc_id, by * 8 + bx AS idx,
           CASE WHEN bs * tn > ts * bn THEN 1 ELSE 0 END AS bit
         FROM blk JOIN tot USING (doc_id))
SELECT doc_id, bit_or(CASE WHEN bit = 0 THEN 0
                           WHEN idx = 63 THEN (-9223372036854775807 - 1)
                           ELSE 1::BIGINT << idx END) AS ahash
FROM bits GROUP BY doc_id
"""


SCENE_FRAME_BYTES = 64
SCENE_CUT_THRESHOLD = 3000


class FrameDiff:
    """Actor-pool stage: byte-stream payload -> scene-cut count. Frames are
    consecutive SCENE_FRAME_BYTES-byte windows (trailing partial frame
    dropped); a cut is a consecutive-frame pair whose integer byte-sum
    difference exceeds SCENE_CUT_THRESHOLD — the cheap luminance-delta
    shot-boundary heuristic, in exact integers so the distributed result
    hashes against SQL. Decode + reshape + one vectorized diff per
    payload."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        F = SCENE_FRAME_BYTES
        n_cuts = np.zeros(len(ids), dtype=np.int64)
        n_full = np.zeros(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            raw = np.frombuffer(payload[i].as_py(), dtype=np.uint8)
            k = len(raw) // F
            n_full[i] = k
            if k < 2:
                continue
            sums = raw[: k * F].reshape(k, F).astype(np.int64).sum(axis=1)
            n_cuts[i] = int(
                (np.abs(np.diff(sums)) > SCENE_CUT_THRESHOLD).sum()
            )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_frames_full": pa.array(n_full),
                "n_cuts": pa.array(n_cuts),
            }
        )


def video_scene_cuts_query(sf_dir: str):
    """Scene-cut detection over deterministic per-doc byte streams (byte j
    of doc d = (d*13 + j) % 251, length 256 + d % 1000 — position-stable
    per doc regardless of batching, unlike the length-only video_frames
    synth). The whole frame-sum/diff arithmetic is SQL-reconstructible, so
    the shot-boundary pipeline gets an exact oracle."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids:
            n = 256 + int(did) % 1000
            j = np.arange(n, dtype=np.int64)
            payloads.append(((int(did) * 13 + j) % 251).astype(np.uint8).tobytes())
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        FrameDiff,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


VIDEO_SCENE_CUTS_ORACLE = f"""
WITH d AS (SELECT doc_id, 256 + doc_id % 1000 AS len FROM documents),
f AS (SELECT doc_id, len // {SCENE_FRAME_BYTES} AS k FROM d),
s AS (
  SELECT f.doc_id, fr.i AS frame_i,
         sum((f.doc_id * 13 + fr.i * {SCENE_FRAME_BYTES} + b.j) % 251) AS fsum
  FROM f, unnest(range(0, k)) AS fr(i),
       unnest(range(0, {SCENE_FRAME_BYTES})) AS b(j)
  GROUP BY 1, 2),
dd AS (
  SELECT doc_id, frame_i, fsum,
         lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_i) AS prev
  FROM s)
SELECT f.doc_id, CAST(f.k AS BIGINT) AS n_frames_full,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cuts
FROM f LEFT JOIN (
  SELECT doc_id, count(*) AS n FROM dd
  WHERE prev IS NOT NULL AND abs(fsum - prev) > {SCENE_CUT_THRESHOLD}
  GROUP BY doc_id) c ON f.doc_id = c.doc_id
"""


class BrightnessHist:
    """Actor-pool stage: PNG payload -> exact 16-bin brightness histogram
    (channel 0, bin = pixel >> 4). The histogram-equalization / exposure-
    audit primitive over a real codec roundtrip: decode once per image, one
    bincount — emits only (doc_id, bin, n_px) rows, never pixels."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_b, out_n = [], [], []
        for i, did in enumerate(ids):
            h, w, c, px = decode_png(payload[i].as_py())
            cnt = np.bincount(px[:, :, 0].ravel() >> 4, minlength=16)
            nz = np.flatnonzero(cnt)
            out_id.append(np.full(len(nz), did, dtype=np.int64))
            out_b.append(nz.astype(np.int64))
            out_n.append(cnt[nz].astype(np.int64))
        if not out_id:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bin": pa.array([], pa.int64()),
                    "n_px": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "bin": pa.array(np.concatenate(out_b)),
                "n_px": pa.array(np.concatenate(out_n)),
            }
        )


def image_histogram_query(sf_dir: str):
    """16-bin brightness histograms over real gradient PNGs — synth payloads
    (SQL-reconstructible pixels), decode + bincount in an actor pool."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        _synth_gradient_pngs, batch_format="pyarrow", batch_size=None
    ).map_batches(
        BrightnessHist,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


class EqualizeStage:
    """Actor-pool stage: PNG payload -> histogram-equalized pixel checksum.
    Per image the standard 256-level CDF remap eq(v) = ((cdf(v) - cdf_min)
    * 255) // (n_px - cdf_min) (0 when the image is constant), computed as
    one bincount + cumsum + gather — all integer, so the SQL dual replays
    it exactly from the synthesized pixel formula. Emits only (doc_id,
    eq_sum, n_px) — pixels never leave the actor."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out_s = np.zeros(len(ids), dtype=np.int64)
        out_n = np.zeros(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            h, w, c, px = decode_png(payload[i].as_py())
            v = px[:, :, 0].ravel().astype(np.int64)
            cnt = np.bincount(v, minlength=256)
            cdf = np.cumsum(cnt)
            n = int(cdf[-1])
            cmin = int(cdf[np.flatnonzero(cnt)[0]])
            if n == cmin:
                eq = np.zeros(256, dtype=np.int64)
            else:
                eq = ((cdf - cmin) * 255) // (n - cmin)
            out_s[i] = int((eq * cnt).sum())
            out_n[i] = n
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "eq_sum": pa.array(out_s),
                "n_px": pa.array(out_n),
            }
        )


def image_equalize_query(sf_dir: str):
    """Histogram equalization over real gradient PNGs (see
    _synth_gradient_pngs): decode + integer CDF remap in an actor pool,
    with the remap arithmetic replayed exactly by IMAGE_EQUALIZE_ORACLE."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        _synth_gradient_pngs, batch_format="pyarrow", batch_size=None
    ).map_batches(
        EqualizeStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


class HaarStage:
    """Actor-pool stage: PNG payload -> 1-level 2D Haar band sums. The
    image is cropped to even dims, split into 2x2 blocks (a b / c d), and
    the four un-normalized Haar responses are folded per image: LL sum
    a+b+c+d, plus absolute detail energies |a-b+c-d| (LH), |a+b-c-d| (HL),
    |a-b-c+d| (HH) — all integer, so the SQL dual replays them from the
    synthesized pixel formula. Emits only (doc_id, 4 sums); pixels never
    leave the actor."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        ll = np.zeros(len(ids), dtype=np.int64)
        lh = np.zeros(len(ids), dtype=np.int64)
        hl = np.zeros(len(ids), dtype=np.int64)
        hh = np.zeros(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            h, w, c, px = decode_png(payload[i].as_py())
            g = px[: h - h % 2, : w - w % 2, 0].astype(np.int64)
            a = g[0::2, 0::2]
            b = g[0::2, 1::2]
            cc = g[1::2, 0::2]
            d = g[1::2, 1::2]
            ll[i] = int((a + b + cc + d).sum())
            lh[i] = int(np.abs(a - b + cc - d).sum())
            hl[i] = int(np.abs(a + b - cc - d).sum())
            hh[i] = int(np.abs(a - b - cc + d).sum())
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "ll_sum": pa.array(ll),
                "lh_abs": pa.array(lh),
                "hl_abs": pa.array(hl),
                "hh_abs": pa.array(hh),
            }
        )


def image_haar_query(sf_dir: str):
    """1-level 2D Haar wavelet band energies over real gradient PNGs (see
    _synth_gradient_pngs): decode + integer lifting sums in an actor pool,
    replayed exactly by IMAGE_HAAR_ORACLE from the pixel formula."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        _synth_gradient_pngs, batch_format="pyarrow", batch_size=None
    ).map_batches(
        HaarStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


IMAGE_HAAR_ORACLE = """
WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id % 7) * 3 AS h
           FROM documents),
blk AS (
  SELECT doc_id,
         (doc_id + 2 * xs.x + 2 * ys.y) % 256 AS a,
         (doc_id + 2 * xs.x + 1 + 2 * ys.y) % 256 AS b,
         (doc_id + 2 * xs.x + 2 * ys.y + 1) % 256 AS c,
         (doc_id + 2 * xs.x + 2 * ys.y + 2) % 256 AS e
  FROM d, unnest(range(0, h // 2)) AS ys(y), unnest(range(0, w // 2)) AS xs(x))
SELECT doc_id,
       CAST(sum(a + b + c + e) AS BIGINT) AS ll_sum,
       CAST(sum(abs(a - b + c - e)) AS BIGINT) AS lh_abs,
       CAST(sum(abs(a + b - c - e)) AS BIGINT) AS hl_abs,
       CAST(sum(abs(a - b - c + e)) AS BIGINT) AS hh_abs
FROM blk GROUP BY 1
"""


IMAGE_EQUALIZE_ORACLE = """
WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id % 7) * 3 AS h
           FROM documents),
p AS (
  SELECT doc_id, ((doc_id + xs.x + ys.y) % 256) AS v
  FROM d, unnest(range(0, h)) AS ys(y), unnest(range(0, w)) AS xs(x)),
hh AS (SELECT doc_id, v, count(*) AS c FROM p GROUP BY 1, 2),
cd AS (SELECT doc_id, v, c,
              sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS cf
       FROM hh),
mt AS (SELECT doc_id, min(cf) AS cmin, sum(c) AS n FROM cd GROUP BY 1)
SELECT cd.doc_id,
       CAST(sum(CASE WHEN mt.n = mt.cmin THEN 0
                     ELSE (((cd.cf - mt.cmin) * 255) // (mt.n - mt.cmin))
                          * cd.c END) AS BIGINT) AS eq_sum,
       CAST(any_value(mt.n) AS BIGINT) AS n_px
FROM cd JOIN mt USING (doc_id)
GROUP BY 1
"""


IMAGE_HISTOGRAM_ORACLE = """
WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id % 7) * 3 AS h
           FROM documents),
p AS (
  SELECT doc_id, ((doc_id + xs.x + ys.y) % 256) // 16 AS bin
  FROM d, unnest(range(0, h)) AS ys(y), unnest(range(0, w)) AS xs(x))
SELECT doc_id, CAST(bin AS BIGINT) AS bin, count(*) AS n_px
FROM p GROUP BY 1, 2
"""


class SobelStage:
    """Actor-pool stage: PNG payload -> integer Sobel edge energy. The
    standard 3x3 Sobel correlation (Gx transposed for Gy) over the interior
    (valid) pixels of channel 0, energy = sum(|gx| + |gy|) — all integer,
    so the SQL dual replays it from the synthesized closed-form pixels.
    Emits only (doc_id, n_interior, sobel_energy); pixels never leave the
    actor."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out_n = np.zeros(len(ids), dtype=np.int64)
        out_e = np.zeros(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            h, w, c, px = decode_png(payload[i].as_py())
            g = px[:, :, 0].astype(np.int64)
            gx = (
                (g[:-2, 2:] - g[:-2, :-2])
                + 2 * (g[1:-1, 2:] - g[1:-1, :-2])
                + (g[2:, 2:] - g[2:, :-2])
            )
            gy = (
                (g[2:, :-2] - g[:-2, :-2])
                + 2 * (g[2:, 1:-1] - g[:-2, 1:-1])
                + (g[2:, 2:] - g[:-2, 2:])
            )
            out_n[i] = gx.size
            out_e[i] = int((np.abs(gx) + np.abs(gy)).sum())
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_interior": pa.array(out_n),
                "sobel_energy": pa.array(out_e),
            }
        )


def image_sobel_query(sf_dir: str):
    """Sobel edge energy over real gradient PNGs (see _synth_gradient_pngs):
    the stencil-compute pattern for image pipelines — decode + 3x3 integer
    convolution in an actor pool, exact oracle from the pixel formula."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        _synth_gradient_pngs, batch_format="pyarrow", batch_size=None
    ).map_batches(
        SobelStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


# gx/gy are rendered from the same closed-form pixel (doc_id + x + y) % 256
# the other image oracles walk; interior coords x in [1, w-2], y in [1, h-2].
def _px(dx: int, dy: int) -> str:
    return f"((doc_id + xs.x + {dx} + ys.y + {dy}) % 256)"


IMAGE_SOBEL_ORACLE = f"""
WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id % 7) * 3 AS h
           FROM documents),
g AS (
  SELECT doc_id,
    ({_px(1, -1)} - {_px(-1, -1)})
      + 2 * ({_px(1, 0)} - {_px(-1, 0)})
      + ({_px(1, 1)} - {_px(-1, 1)}) AS gx,
    ({_px(-1, 1)} - {_px(-1, -1)})
      + 2 * ({_px(0, 1)} - {_px(0, -1)})
      + ({_px(1, 1)} - {_px(1, -1)}) AS gy
  FROM d, unnest(range(1, h - 1)) AS ys(y), unnest(range(1, w - 1)) AS xs(x))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_interior,
       CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS sobel_energy
FROM g GROUP BY 1
"""


# ------------------------------------------------- image near-dup (ahash LSH)
AHASH_DUP_MAX_HAMMING = 2
_AHASH_DUP_BANDS = 4          # 4 x 16-bit bands: LOSSLESS for hamming <= 3
_AHASH_DUP_SHARDS = 32


def _synth_dup_pngs(tbl: pa.Table, modulus: int = 250) -> pa.Table:
    """Deterministic REAL-codec payloads with PLANTED near-duplicates:
    pixel (y, x) = (m*(x + 2y + 3) + x*y) % 256 at 16x16 where m = doc_id %
    250, and rows with doc_id >= 250 additionally bump one 2x2 block
    ((m % 8, 3m % 8)) by +60 — so (i, i + 250) are near-identical images
    whose ahashes differ by 0-2 bits for most pairs while distinct m values
    stay far apart (435 distinct hashes / 500 docs). Every pixel is integer
    arithmetic the SQL oracle replays exactly."""
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    yy, xx = np.mgrid[0:16, 0:16]
    payloads = []
    for did in ids:
        m = int(did) % modulus
        g = (m * (xx + 2 * yy + 3) + xx * yy) % 256
        if int(did) >= modulus:
            bx, by = m % 8, (m * 3) % 8
            g = g.copy()
            g[2 * by:2 * by + 2, 2 * bx:2 * bx + 2] = (
                g[2 * by:2 * by + 2, 2 * bx:2 * bx + 2] + 60
            ) % 256
        payloads.append(encode_png(np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)))
    return pa.table(
        {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
    )


def image_ahash_dup_query(sf_dir: str, max_hamming: int = AHASH_DUP_MAX_HAMMING,
                          modulus: int = 250, num_blocks: int | None = None,
                          concurrency: int = 2):
    """Image near-duplicate PAIR JOIN: hamming(ahash_l, ahash_r) <=
    max_hamming over real PNG roundtrips, found by banded LSH on the 64-bit
    ahash — 4 x 16-bit bands, so for max_hamming <= 3 the banding is
    LOSSLESS by pigeonhole (<= 3 differing bits cannot touch all 4 bands)
    and the SQL oracle is the pure pair semantics, not a re-walk of the
    banding. Scale shape mirrors minhash LSH: only (band_key, doc_id,
    ahash) shuffles — 20 bytes/row/band — grouped by a bounded shard key;
    per-shard pairing is one vectorized pandas self-merge + popcount64
    verify. At 10^12 images the band keys get salted by a hash prefix
    exactly like dedup.py's celebrity cap; payload bytes never move."""
    import ray

    from ..kernels import hashing

    # num_blocks: codec work is per-image CPU; a single-file read is ONE
    # block -> one synth task, so by default both the synth block count and
    # the decode actor pool SIZE TO THE CLUSTER (codec stages are the rare
    # case where wall time is pure per-row CPU — leaving them at 1 block /
    # 2 actors serializes the whole pipeline on a 32-core node).
    if num_blocks is None or concurrency == 2:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        if num_blocks is None:
            num_blocks = max(4, cpus * 2)
        if concurrency == 2:
            concurrency = max(2, cpus // 4)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        override_num_blocks=num_blocks,
    )
    ah = ds.map_batches(
        lambda t: _synth_dup_pngs(t, modulus),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(AHash, batch_size=256, batch_format="pyarrow",
                  concurrency=concurrency, num_cpus=1)

    def band_explode(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = tbl["ahash"].to_numpy(zero_copy_only=False).view(np.uint64)
        parts = []
        for b in range(_AHASH_DUP_BANDS):
            key = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bk = key * _AHASH_DUP_BANDS + b
            with np.errstate(over="ignore"):
                shard = (
                    bk.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ) % np.uint64(_AHASH_DUP_SHARDS)
            parts.append(
                pa.table(
                    {
                        "shard": pa.array(shard.astype(np.int64)),
                        "bk": pa.array(bk),
                        "doc_id": pa.array(ids),
                        "ahash": tbl["ahash"],
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs_in_shard(df):
        import pandas as pd

        empty = pd.DataFrame(
            {"left_id": np.array([], dtype=np.int64),
             "right_id": np.array([], dtype=np.int64)}
        )
        sub = df[["bk", "doc_id", "ahash"]]
        # pair DISTINCT hash values per bucket first, then expand only the
        # hamming-passing hash pairs back to doc pairs — the doc-level
        # self-merge is quadratic in duplicate DENSITY (a corpus where every
        # image has d near-copies costs d^2 per bucket); the hash-level
        # merge is bounded by the distinct-hash vocabulary
        dh = sub.drop_duplicates(["bk", "ahash"])
        cand = dh.merge(dh, on="bk", suffixes=("_l", "_r"))
        cand = cand[cand["ahash_l"] <= cand["ahash_r"]]
        if len(cand) == 0:
            return empty
        x = cand["ahash_l"].to_numpy().astype(np.int64).view(np.uint64) ^ \
            cand["ahash_r"].to_numpy().astype(np.int64).view(np.uint64)
        cand = cand[hashing.popcount64(x) <= max_hamming]
        if len(cand) == 0:
            return empty
        hp = cand[["bk", "ahash_l", "ahash_r"]]
        left = hp.merge(
            sub.rename(columns={"ahash": "ahash_l", "doc_id": "left_id"}),
            on=["bk", "ahash_l"],
        )
        both = left.merge(
            sub.rename(columns={"ahash": "ahash_r", "doc_id": "right_id"}),
            on=["bk", "ahash_r"],
        )
        a = both["left_id"].to_numpy().astype(np.int64)
        b = both["right_id"].to_numpy().astype(np.int64)
        m = a != b
        a, b = a[m], b[m]
        # normalize to (min, max): a cross-hash pair may surface with its
        # smaller doc id on either side (downstream groupby dedupes the
        # same-hash double emission)
        return pd.DataFrame(
            {"left_id": np.minimum(a, b), "right_id": np.maximum(a, b)}
        )

    def pairs_shard(tbl: pa.Table) -> pa.Table:
        # hash_exchange shard fn (Ray's sort-based groupby().map_groups on
        # the shard key measured ~10x slower on this access pattern — same
        # pathology rfm_segments hit; see ops.hash_exchange docstring)
        empty = pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or "bk" not in tbl.schema.names:
            return empty
        df = pairs_in_shard(tbl.select(["bk", "doc_id", "ahash"]).to_pandas())
        if len(df) == 0:
            return empty
        return pa.table(
            {
                "left_id": pa.array(df["left_id"].to_numpy().astype(np.int64)),
                "right_id": pa.array(df["right_id"].to_numpy().astype(np.int64)),
            }
        )

    from .. import ops as _ops

    keyed = ah.map_batches(band_explode, batch_format="pyarrow", batch_size=None)
    pairs = _ops.hash_exchange(keyed, "shard", _AHASH_DUP_SHARDS, pairs_shard)
    out = (
        pairs.groupby(["left_id", "right_id"]).count()
        .select_columns(["left_id", "right_id"])
    )
    return _typed_ahash_pairs(out)


def _typed_ahash_pairs(ds):
    def cast(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left_id": tbl["left_id"].cast(pa.int64()),
                "right_id": tbl["right_id"].cast(pa.int64()),
            }
        )

    return ds.map_batches(cast, batch_format="pyarrow", batch_size=None)


IMAGE_AHASH_DUP_ORACLE = f"""
WITH d AS (SELECT doc_id, doc_id % 250 AS m FROM documents),
px AS (
  SELECT doc_id, x, y,
    CASE WHEN doc_id >= 250 AND x // 2 = m % 8 AND y // 2 = (m * 3) % 8
         THEN ((m * (x + 2 * y + 3) + x * y) % 256 + 60) % 256
         ELSE (m * (x + 2 * y + 3) + x * y) % 256 END AS v
  FROM d, unnest(range(0, 16)) AS ys(y), unnest(range(0, 16)) AS xs(x)),
tot AS (SELECT doc_id, sum(v) AS ts FROM px GROUP BY 1),
blk AS (SELECT doc_id, y // 2 AS by, x // 2 AS bx, sum(v) AS bs
        FROM px GROUP BY 1, 2, 3),
bits AS (SELECT blk.doc_id, by * 8 + bx AS idx,
           CASE WHEN bs * 256 > ts * 4 THEN 1 ELSE 0 END AS bit
         FROM blk JOIN tot USING (doc_id)),
ah AS (SELECT doc_id, bit_or(CASE WHEN bit = 0 THEN 0
                                  WHEN idx = 63 THEN (-9223372036854775807 - 1)
                                  ELSE 1::BIGINT << idx END) AS ahash
       FROM bits GROUP BY doc_id)
SELECT CAST(l.doc_id AS BIGINT) AS left_id, CAST(r.doc_id AS BIGINT) AS right_id
FROM ah l, ah r
WHERE l.doc_id < r.doc_id
  AND bit_count(xor(l.ahash, r.ahash)) <= {AHASH_DUP_MAX_HAMMING}
"""


# ------------------------------------------------- pitch via autocorrelation
PITCH_LEN = 400       # samples per doc
PITCH_LAG_MIN = 40    # lag grid: 40, 44, ..., 220 (period P(did) is always
PITCH_LAG_MAX = 220   # a multiple of 4 and inside the grid)
PITCH_LAG_STEP = 4


def _pitch_period(did: int) -> int:
    return 80 + 20 * (did % 7)


class PitchAutocorr:
    """Actor-pool stage: WAV payload -> fundamental-period estimate by exact
    integer autocorrelation.  R(L) = sum_n k(n) k(n+L) over the decoded
    int16 samples, evaluated on the lag grid; pitch_lag = the smallest lag
    attaining the maximum R (periodic signals peak at every multiple of the
    period, so smallest-first IS the fundamental).  Batched across the doc
    axis: all docs in the batch stack into one (D, N) int64 matrix and each
    lag is one vectorized einsum — the lag loop is O(n_lags), never O(rows)."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pitch_lag": pa.array([], pa.int64()),
                             "r_max": pa.array([], pa.int64())})
        mat = np.empty((len(ids), PITCH_LEN), dtype=np.int64)
        for i in range(len(ids)):
            rate, ch, x = decode_wav(payload[i].as_py())
            mat[i] = np.round(x[:, 0].astype(np.float64) * 32768.0).astype(np.int64)
        lags = np.arange(PITCH_LAG_MIN, PITCH_LAG_MAX + 1, PITCH_LAG_STEP)
        r = np.empty((len(ids), len(lags)), dtype=np.int64)
        for j, lag in enumerate(lags):
            r[:, j] = np.einsum(
                "ij,ij->i", mat[:, : PITCH_LEN - lag], mat[:, lag:]
            )
        best = r.max(axis=1)
        # smallest lag attaining the max (argmax returns first occurrence,
        # and lags are ascending)
        pick = lags[np.argmax(r == best[:, None], axis=1)]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "pitch_lag": pa.array(pick.astype(np.int64)),
                "r_max": pa.array(best),
            }
        )


def audio_pitch_query(sf_dir: str):
    """Pitch (fundamental period) estimation over REAL WAV payloads with a
    per-doc period P(did) = 80 + 20*(did % 7): sawtooth k(n) =
    ((did + n) % P) - P//2 quantizes exactly through the 16-bit PCM
    roundtrip, so the integer autocorrelation — and therefore the argmax
    period — has a bit-exact SQL dual (AUDIO_PITCH_ORACLE)."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = np.arange(PITCH_LEN, dtype=np.int64)
        payloads = []
        for did in ids:
            p = _pitch_period(int(did))
            k = (int(did) + n) % p - p // 2
            payloads.append(encode_wav(k / 32767.0, rate=8000))
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        PitchAutocorr,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


AUDIO_PITCH_ORACLE = f"""
WITH s AS (
  SELECT doc_id, t.n,
         (doc_id + t.n) % (80 + 20 * (doc_id % 7))
           - (80 + 20 * (doc_id % 7)) // 2 AS v
  FROM documents, unnest(range(0, {PITCH_LEN})) AS t(n)),
r AS (
  SELECT a.doc_id, b.n - a.n AS lag, sum(a.v * b.v) AS r
  FROM s a JOIN s b ON a.doc_id = b.doc_id
   AND b.n - a.n BETWEEN {PITCH_LAG_MIN} AND {PITCH_LAG_MAX}
   AND (b.n - a.n) % {PITCH_LAG_STEP} = 0
  GROUP BY 1, 2)
SELECT doc_id, CAST(lag AS BIGINT) AS pitch_lag, CAST(r AS BIGINT) AS r_max
FROM r
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY r DESC, lag ASC) = 1
"""


# ----------------------------------------------- scene keyframe extraction
class SceneKeyframes:
    """Actor-pool stage: byte-stream payload -> one row per detected SCENE
    (frame 0 starts scene 0; every cut opens a new one), carrying the
    scene's start frame and that keyframe's integer byte sum — the
    shot-boundary + keyframe-signature composition a video curation
    pipeline runs before expensive per-scene models.  Same exact-integer
    frame arithmetic as FrameDiff, so the SQL dual is bit-exact."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        F = SCENE_FRAME_BYTES
        out_id, out_s, out_f, out_sum = [], [], [], []
        for i in range(len(ids)):
            raw = np.frombuffer(payload[i].as_py(), dtype=np.uint8)
            k = len(raw) // F
            if k == 0:
                continue
            sums = raw[: k * F].reshape(k, F).astype(np.int64).sum(axis=1)
            cut_after = np.abs(np.diff(sums)) > SCENE_CUT_THRESHOLD
            starts = np.concatenate(
                [[0], np.flatnonzero(cut_after).astype(np.int64) + 1]
            )
            out_id.append(np.full(len(starts), ids[i], dtype=np.int64))
            out_s.append(np.arange(len(starts), dtype=np.int64))
            out_f.append(starts)
            out_sum.append(sums[starts])
        if not out_id:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "scene_idx": pa.array([], pa.int64()),
                    "start_frame": pa.array([], pa.int64()),
                    "key_sum": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "scene_idx": pa.array(np.concatenate(out_s)),
                "start_frame": pa.array(np.concatenate(out_f)),
                "key_sum": pa.array(np.concatenate(out_sum)),
            }
        )


def video_scene_keyframes_query(sf_dir: str):
    """Scene segmentation + keyframe signatures over the same deterministic
    byte streams as video_scene_cuts (byte j of doc d = (d*13 + j) % 251)."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids:
            n = 256 + int(did) % 1000
            j = np.arange(n, dtype=np.int64)
            payloads.append(((int(did) * 13 + j) % 251).astype(np.uint8).tobytes())
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        SceneKeyframes,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


VIDEO_SCENE_KEYFRAMES_ORACLE = f"""
WITH d AS (SELECT doc_id, 256 + doc_id % 1000 AS len FROM documents),
f AS (SELECT doc_id, len // {SCENE_FRAME_BYTES} AS k FROM d),
s AS (
  SELECT f.doc_id, fr.i AS frame_i,
         sum((f.doc_id * 13 + fr.i * {SCENE_FRAME_BYTES} + b.j) % 251) AS fsum
  FROM f, unnest(range(0, k)) AS fr(i),
       unnest(range(0, {SCENE_FRAME_BYTES})) AS b(j)
  GROUP BY 1, 2),
dd AS (
  SELECT doc_id, frame_i, fsum,
         lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_i) AS prev
  FROM s),
starts AS (
  SELECT doc_id, frame_i, fsum FROM dd
  WHERE prev IS NULL OR abs(fsum - prev) > {SCENE_CUT_THRESHOLD})
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY frame_i) - 1
            AS BIGINT) AS scene_idx,
       CAST(frame_i AS BIGINT) AS start_frame,
       CAST(fsum AS BIGINT) AS key_sum
FROM starts
"""


# ----------------------------------------------- integer-quantized DFT
DFT_N = 400
DFT_KS = (1, 2, 3, 4)
DFT_QUANT = 1000.0
_TWO_PI = 6.283185307179586


class DftEnergy:
    """Actor-pool stage: WAV payload -> exact integer DFT components at the
    first DFT_KS harmonics.  The trig twiddles quantize to round(cos*1000)
    int64 milli-units ONCE per actor (__init__), so the per-sample products
    and their sums are order-free exact integers — the trick that gives a
    spectral feature an exact SQL dual despite involving cos/sin: both
    sides evaluate the identical float expression cos(((k*n)*2pi)/N), then
    round, then do only integer arithmetic."""

    def __init__(self):
        n = np.arange(DFT_N, dtype=np.float64)
        self.c = np.empty((len(DFT_KS), DFT_N), dtype=np.int64)
        self.s = np.empty((len(DFT_KS), DFT_N), dtype=np.int64)
        for i, k in enumerate(DFT_KS):
            ang = ((k * n) * _TWO_PI) / DFT_N
            self.c[i] = np.round(np.cos(ang) * DFT_QUANT).astype(np.int64)
            self.s[i] = np.round(np.sin(ang) * DFT_QUANT).astype(np.int64)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = tbl["payload"].combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "re_milli": pa.array([], pa.int64()),
                             "im_milli": pa.array([], pa.int64())})
        mat = np.empty((len(ids), DFT_N), dtype=np.int64)
        for i in range(len(ids)):
            rate, ch, x = decode_wav(payload[i].as_py())
            mat[i] = np.round(x[:, 0].astype(np.float64) * 32768.0).astype(np.int64)
        re = mat @ self.c.T  # (B, K) int64
        im = mat @ self.s.T
        nk = len(DFT_KS)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, nk)),
                "k": pa.array(np.tile(np.array(DFT_KS, dtype=np.int64), len(ids))),
                "re_milli": pa.array(re.reshape(-1)),
                "im_milli": pa.array(im.reshape(-1)),
            }
        )


def audio_dft_energy_query(sf_dir: str):
    """Integer-exact spectral components over REAL WAV payloads (the
    audio_window_energy sawtooth k(n) = ((did*7 + n) % 200) - 100, length
    DFT_N): per doc and harmonic k, the quantized-twiddle DFT re/im sums."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = np.arange(DFT_N, dtype=np.int64)
        payloads = []
        for did in ids:
            k = ((int(did) * 7 + n) % 200) - 100
            payloads.append(encode_wav(k / 32767.0, rate=8000))
        return pa.table(
            {"doc_id": pa.array(ids), "payload": pa.array(payloads, type=pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=None).map_batches(
        DftEnergy,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )


# Parity caveat (ADVICE r3): this dual assumes numpy and DuckDB cos/sin
# agree AFTER round(x*1000) — i.e. no twiddle value sits within a 1-ulp
# cross-library disagreement of a .5 rounding boundary. The margin is
# asserted (>1e-6, measured ~1.4e-3) in
# tests/test_functions.py::test_audio_dft_twiddle_rounding_margin, so an
# unlucky DFT_N/DFT_KS/DFT_QUANT change fails loudly instead of silently.
AUDIO_DFT_ORACLE = f"""
WITH nn AS (SELECT unnest(range(0, {DFT_N})) AS n),
kk AS (SELECT unnest([{", ".join(str(k) for k in DFT_KS)}]) AS k),
tw AS (
  SELECT kk.k, nn.n,
    CAST(round(cos(((kk.k * nn.n) * {_TWO_PI!r}) / {DFT_N}.0) * {DFT_QUANT!r})
         AS BIGINT) AS cm,
    CAST(round(sin(((kk.k * nn.n) * {_TWO_PI!r}) / {DFT_N}.0) * {DFT_QUANT!r})
         AS BIGINT) AS sm
  FROM kk CROSS JOIN nn),
x AS (
  SELECT doc_id, nn.n, (doc_id * 7 + nn.n) % 200 - 100 AS v
  FROM documents CROSS JOIN nn)
SELECT x.doc_id, CAST(tw.k AS BIGINT) AS k,
       CAST(sum(x.v * tw.cm) AS BIGINT) AS re_milli,
       CAST(sum(x.v * tw.sm) AS BIGINT) AS im_milli
FROM x JOIN tw USING (n) GROUP BY 1, 2
"""

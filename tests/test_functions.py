"""Pure batch-function tests for text / dedup / multimodal operators
(no Ray session needed — these exercise the per-batch kernels directly)."""

import numpy as np
import pyarrow as pa

from spatialindex_ray.functions import dedup, multimodal, text


def _doc_table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )


def test_token_stats_edge_cases():
    t = _doc_table(["a b c", "", "  leading", "trailing  ", "one", "a  b"])
    out = text.token_stats_batch(t)
    assert out["n_tokens"].to_pylist() == [3, 0, 1, 1, 1, 2]
    assert out["n_chars"].to_pylist() == [5, 0, 9, 10, 3, 4]


def test_fingerprint_deterministic_and_distinct():
    t = _doc_table(["hello world", "hello world", "hello worle", "", "h"])
    out = text.fingerprint_batch(t)["fingerprint"].to_pylist()
    assert out[0] == out[1]
    assert out[0] != out[2]
    assert len({out[2], out[3], out[4]}) == 3
    # batch-size independence: same rows, different batch composition
    t2 = _doc_table(["hello world"])
    out2 = text.fingerprint_batch(t2)["fingerprint"].to_pylist()
    assert out2[0] == out[0]


def test_quality_score_monotone_signals():
    good = "the quick brown fox jumps over the lazy dog near riverbank today"
    bad = "a a a a a a a a a a a a"
    t = _doc_table([good, bad])
    out = text.quality_score_batch(t)["quality"].to_pylist()
    assert out[0] > out[1]


def test_lang_id_stopwords():
    lid = text.LangID()
    t = _doc_table(
        ["the cat sat on the mat and it was good",
         "der hund ist von den bergen und nicht hier",
         "xyzzy qwerty plugh"]
    )
    out = lid(t)["lang_pred"].to_pylist()
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"


def test_minhash_similarity_estimates():
    base = "w" + " w".join(str(i % 37) for i in range(300))
    near = base.replace("w1 ", "w999 ")  # small perturbation
    far = "z" + " z".join(str(i % 41) for i in range(300))
    t = _doc_table([base, near, far])
    sig = dedup.minhash_batch(t)
    s = np.stack(sig["sig"].to_numpy(zero_copy_only=False))
    sim_near = (s[0] == s[1]).mean()
    sim_far = (s[0] == s[2]).mean()
    # true jaccard(base, near) ~= 0.85 with only 37 distinct shingles;
    # 64-perm estimate has sigma ~= 0.045 -> loose bound
    assert sim_near > 0.6
    assert sim_far < 0.2


def test_simhash_hamming_tracks_similarity():
    base = " ".join(str(i % 23) for i in range(500))
    near = base.replace(" 1 ", " 9991 ")
    far = " ".join(str(i % 29 + 1000) for i in range(500))
    t = _doc_table([base, near, far])
    out = dedup.simhash_batch(t)["simhash"].to_pylist()

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(out[0], out[1]) < ham(out[0], out[2])


def test_multimodal_decode_stub_plumbing():
    payloads = [bytes([i % 256, (i * 7) % 256]) * (50 + i) for i in range(10)]
    t = pa.table(
        {"url": pa.array([f"u{i}" for i in range(10)]),
         "payload": pa.array(payloads, type=pa.binary())}
    )
    dec = multimodal.DecodeImage()
    out = dec(t)
    assert out["width"].to_pylist()[0] == 64 + payloads[0][0]
    assert len(out["features"][0]) == multimodal.DecodeImage.FEATURE_DIM
    rs = multimodal.ResizeImage(target=32)(t)
    assert all(len(b) <= 32 for b in rs["resized"].to_pylist())
    sf = multimodal.SampleFrames(frame_bytes=16, every=2)(t)
    assert sf["n_frames"].to_pylist()[0] >= 1


def test_hash64_strings_vectorized_vs_scalar():
    from spatialindex_ray import ops

    vals = ["", "a", "ab", "hello world", "x" * 500]
    arr = pa.array(vals)
    h = ops.hash64_strings(arr)
    assert len(set(h.tolist())) == len(vals)
    # stability across different batch groupings
    h2 = ops.hash64_strings(pa.array(vals[2:]))
    assert h[2] == h2[0]


def test_sha1_kernel_matches_hashlib():
    import hashlib

    from spatialindex_ray.kernels import hashing

    msgs = [b"", b"a", b"x" * 55, b"y" * 56, b"z" * 64, b"w" * 200,
            "https://site1.example/00000001".encode()]
    got = hashing.sha1_pairs_of_strings(msgs)
    for i, m in enumerate(msgs):
        d = hashlib.sha1(m).digest()
        assert got[i, 0] == int.from_bytes(d[0:8], "big")
        assert got[i, 1] == int.from_bytes(d[8:16], "big")
    # full digest bytes
    import numpy as np

    offs = np.array([0, 3], dtype=np.int64)
    db = hashing.sha1_digest_bytes(np.frombuffer(b"abc", dtype=np.uint8), offs)
    assert bytes(db[0]) == hashlib.sha1(b"abc").digest()


def test_fingerprint_long_outlier_memory():
    """One 1 MB doc among 20k rows must not inflate the batch (the round-1
    padded-matrix implementation would have allocated 20k x 1MB x 8 bytes =
    160 GB here and crashed)."""
    texts = ["short doc %d" % i for i in range(20000)]
    texts[123] = "x" * 1_000_000
    t = _doc_table(texts)
    out = text.fingerprint_batch(t)
    fps = out["fingerprint"].to_pylist()
    # outlier hashes like any other row, identical rows don't exist here
    assert len(fps) == 20000
    solo = text.fingerprint_batch(_doc_table(["x" * 1_000_000]))
    assert solo["fingerprint"].to_pylist()[0] == fps[123]


def test_minhash_celebrity_bucket_cap():
    """Oversized buckets emit O(k) chain pairs that keep the cluster
    CONNECTED; normal buckets keep exact all-pairs."""
    import pandas as pd

    k = dedup.MINHASH_BUCKET_CAP * 3
    big = pd.DataFrame(
        {
            "band": np.zeros(k, dtype=np.int64),
            "bucket": np.full(k, 42, dtype=np.int64),
            "doc_id": np.arange(k, dtype=np.int64),
            "pos": np.arange(k, dtype=np.int64),
        }
    )
    small = pd.DataFrame(
        {
            "band": np.ones(4, dtype=np.int64),
            "bucket": np.full(4, 7, dtype=np.int64),
            "doc_id": np.arange(100, 104, dtype=np.int64),
            "pos": np.arange(k, k + 4, dtype=np.int64),
        }
    )
    sub = pd.concat([big, small], ignore_index=True)
    cand = dedup._candidate_pairs(sub)
    big_pairs = cand[cand["bucket"] == 42]
    small_pairs = cand[cand["bucket"] == 7]
    assert len(big_pairs) == k - 1  # chain, not k*(k-1)/2
    assert len(small_pairs) == 6  # exact all-pairs (4 choose 2)
    # connectivity of the capped cluster via union-find
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(big_pairs["doc_id_l"], big_pairs["doc_id_r"]):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(k)}) == 1


def test_png_roundtrip_and_decode_stage():
    """Real PNG path: encode -> decode roundtrip exact for gray/RGB/RGBA;
    all five scanline filter types unfilter correctly; the DecodeImage
    actor stage reports true dimensions for PNG payloads."""
    import struct
    import zlib

    rng = np.random.RandomState(8)
    for c in (1, 3, 4):
        px = rng.randint(0, 256, size=(13, 17, c), dtype=np.uint8)
        raw = multimodal.encode_png(px)
        h, w, cc, out = multimodal.decode_png(raw)
        assert (h, w, cc) == (13, 17, c)
        assert (out == px).all()
    # hand-filtered scanlines: build an image whose rows use filters 0..4
    px = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    stride = 9 * 3
    rows = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(5):
        cur = px[y].reshape(-1).astype(np.int64)
        f = y % 5
        left = np.concatenate([np.zeros(3, dtype=np.int64), cur[:-3]])
        up = prev.astype(np.int64)
        ul = np.concatenate([np.zeros(3, dtype=np.int64), up[:-3]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - up
        elif f == 3:
            enc = cur - ((left + up) >> 1)
        else:
            p = left + up - ul
            pred = np.where(
                (abs(p - left) <= abs(p - up)) & (abs(p - left) <= abs(p - ul)),
                left,
                np.where(abs(p - up) <= abs(p - ul), up, ul),
            )
            enc = cur - pred
        rows.append(np.concatenate([[f], enc & 0xFF]).astype(np.uint8))
        prev = px[y].reshape(-1)
    body = zlib.compress(np.concatenate(rows).tobytes())

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = (
        multimodal._PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )
    h, w, cc, out = multimodal.decode_png(raw)
    assert (out == px).all()
    # actor stage reports true dims for PNG payloads
    payloads = [multimodal.encode_png(rng.randint(0, 256, (6 + i, 7, 3), dtype=np.uint8)) for i in range(4)]
    t = pa.table(
        {"url": pa.array([f"u{i}" for i in range(4)]),
         "payload": pa.array(payloads, type=pa.binary())}
    )
    out_t = multimodal.DecodeImage()(t)
    assert out_t["height"].to_pylist() == [6, 7, 8, 9]
    assert out_t["width"].to_pylist() == [7, 7, 7, 7]
    assert out_t["channels"].to_pylist() == [3, 3, 3, 3]


def test_wav_roundtrip_and_audio_stage():
    """Real WAV path: encode -> decode roundtrip (16-bit quantization),
    stereo + mono; DecodeAudio reports true rate/channels/duration and
    computes spectral features; non-WAV payloads take the fallback."""
    rng = np.random.RandomState(9)
    mono = np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)).astype(np.float64)
    raw = multimodal.encode_wav(mono, rate=8000)
    rate, ch, samples = multimodal.decode_wav(raw)
    assert (rate, ch) == (8000, 1)
    assert samples.shape == (8000, 1)
    assert np.abs(samples[:, 0] - mono).max() < 1e-3  # 16-bit quantization
    stereo = rng.uniform(-0.5, 0.5, size=(1000, 2))
    raw2 = multimodal.encode_wav(stereo, rate=44100)
    rate2, ch2, s2 = multimodal.decode_wav(raw2)
    assert (rate2, ch2) == (44100, 2) and s2.shape == (1000, 2)
    t = pa.table(
        {
            "url": pa.array(["a", "b", "c"]),
            "payload": pa.array(
                [raw, raw2, b"not audio at all" * 10], type=pa.binary()
            ),
        }
    )
    out = multimodal.DecodeAudio()(t)
    assert out["sample_rate"].to_pylist() == [8000, 44100, 16000]
    assert out["n_channels"].to_pylist() == [1, 2, 1]
    d = out["duration_s"].to_pylist()
    assert abs(d[0] - 1.0) < 1e-6
    f = out["audio_features"].to_pylist()
    assert len(f[0]) == 2 + multimodal.DecodeAudio.N_BANDS
    assert f[0][0] > 0.5  # sine RMS ~ 0.707


def test_fingerprint_oracle_ascii_assumption():
    """FINGERPRINT_ORACLE, WINNOW_ORACLE and CDC_CHUNKS_ORACLE map chars via
    unicode(c), which equals the utf8 byte value the engine hashes only for
    ASCII — assert the driver tables those duals run against satisfy that
    (ADVICE r3: the caveat covers every byte-Horner dual, not just
    fingerprint)."""
    import pyarrow.parquet as pq

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
        assert all(s.isascii() for s in t["text"].to_pylist())


def test_sample_frames_counts():
    """SampleFrames picks every k-th frame_bytes slice: count formula
    ceil((len // frame_bytes) / every) — the video_frames oracle's math."""
    import math

    import pyarrow as pa

    from spatialindex_ray.functions import multimodal

    stage = multimodal.SampleFrames(frame_bytes=64, every=10)
    lengths = [0, 63, 64, 640, 641, 1255]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(lengths)), type=pa.int64()),
            "payload": pa.array([bytes(n) for n in lengths], type=pa.binary()),
        }
    )
    out = stage(tbl)
    got = out["n_frames"].to_pylist()
    exp = [math.ceil((n // 64) / 10.0) for n in lengths]
    assert got == exp
    # every sampled frame slice is exactly frame_bytes long
    for row in out["frames"].to_pylist():
        assert all(len(f) == 64 for f in row)


def test_audio_dft_twiddle_rounding_margin():
    """ADVICE r3: AUDIO_DFT_ORACLE parity relies on numpy and DuckDB cos/sin
    agreeing AFTER round(x*DFT_QUANT) — safe only while every twiddle keeps
    a healthy distance from a .5 rounding boundary (a ~1e-13 cross-library
    1-ulp disagreement must never flip the rounded integer). Assert the
    margin so a future DFT_N/DFT_KS/DFT_QUANT change that lands unluckily
    fails loudly instead of silently breaking the oracle."""
    from spatialindex_ray.functions import multimodal as mm

    n = np.arange(mm.DFT_N, dtype=np.float64)
    worst = 1.0
    for k in mm.DFT_KS:
        ang = ((k * n) * mm._TWO_PI) / mm.DFT_N
        for v in (np.cos(ang) * mm.DFT_QUANT, np.sin(ang) * mm.DFT_QUANT):
            frac = np.abs(v - np.floor(v) - 0.5)
            worst = min(worst, float(frac.min()))
    assert worst > 1e-6

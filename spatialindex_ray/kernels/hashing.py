"""Vectorized hashing kernels shared by the encode / dedup hot paths.

Two primitives, both operating on the *flat* byte buffer + offsets form of an
Arrow string/binary column (zero row-wise Python):

- ``sha1_pairs``: batched SHA-1 over N variable-length messages, returning the
  first two 8-byte digest words per message. The compression function is run
  lane-parallel over all messages that still have blocks left (lanes retire as
  their message ends), so total work is O(total padded bytes) with ~1000
  fused uint32 NumPy ops per 64-byte block *for the whole batch*, not per row.
  Replaces the per-row ``hashlib.sha1`` loop that dominated encode
  (~20 us/row -> sub-us/row).

- ``poly_hash64``: the 64-bit polynomial rolling hash
  ``h = B^L + sum_k b_k * B^(L-1-k)  (mod 2^64)`` computed segment-wise over
  the flat buffer: per-byte weights come from one global power table indexed
  by ``len_i - 1 - k``, and per-row sums are wrap-safe cumsum differences.
  O(total bytes) time and memory — no (N, Lmax) padded matrix, so one long
  outlier document no longer inflates the whole batch (VERDICT r1 item 2).

Both are deterministic and endian-stable (explicit big-endian loads).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U32 = np.uint32
_U64 = np.uint64


def arrow_string_buffer(arr) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 data, int64 offsets (N+1,)) view of an Arrow string /
    large_string / binary column. Zero-copy on the data buffer."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Table):
        raise TypeError("pass a column, not a table")
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    else:
        odt = np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return data, offsets


def _sha1_compress(h: np.ndarray, w16: np.ndarray) -> None:
    """One SHA-1 compression round over M lanes, in place.

    h: (M, 5) uint32 state; w16: (M, 16) uint32 message words (big-endian
    already converted). Standard FIPS-180 rounds, every op an (M,) vector.
    """
    M = len(h)
    w = np.empty((80, M), dtype=_U32)
    w[:16] = w16.T
    one = _U32(1)
    t31 = _U32(31)
    for i in range(16, 80):
        t = w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16]
        w[i] = (t << one) | (t >> t31)
    a = h[:, 0].copy()
    b = h[:, 1].copy()
    c = h[:, 2].copy()
    d = h[:, 3].copy()
    e = h[:, 4].copy()
    c5, c27, c2, c30 = _U32(5), _U32(27), _U32(2), _U32(30)
    for i in range(80):
        if i < 20:
            f = (b & c) | (~b & d)
            k = _U32(0x5A827999)
        elif i < 40:
            f = b ^ c ^ d
            k = _U32(0x6ED9EBA1)
        elif i < 60:
            f = (b & c) | (b & d) | (c & d)
            k = _U32(0x8F1BBCDC)
        else:
            f = b ^ c ^ d
            k = _U32(0xCA62C1D6)
        tmp = ((a << c5) | (a >> c27)) + f + e + k + w[i]
        e = d
        d = c
        c = (b << c30) | (b >> c2)
        b = a
        a = tmp
    h[:, 0] += a
    h[:, 1] += b
    h[:, 2] += c
    h[:, 3] += d
    h[:, 4] += e


def sha1_words(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Batched SHA-1: returns the full digest as (N, 5) big-endian uint32
    words for each message data[offsets[i]:offsets[i+1]].

    Messages of any length; lanes with more blocks keep iterating while
    finished lanes retire, so cost is proportional to total padded bytes.
    """
    n = len(offsets) - 1
    if n == 0:
        return np.empty((0, 5), dtype=_U32)
    lens = offsets[1:] - offsets[:-1]
    n_blocks = (lens + 9 + 63) // 64  # payload + 0x80 + 8-byte bit length
    pad_starts = np.concatenate([[0], np.cumsum(n_blocks * 64)])
    total_pad = int(pad_starts[-1])
    padded = np.zeros(total_pad, dtype=np.uint8)

    total_src = int(lens.sum())
    if total_src:
        # within-row index for every source byte
        within = np.arange(total_src, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        src_idx = np.repeat(offsets[:-1], lens) + within
        dst_idx = np.repeat(pad_starts[:-1], lens) + within
        padded[dst_idx] = data[src_idx]
    # 0x80 terminator right after each message
    padded[pad_starts[:-1] + lens] = 0x80
    # big-endian 64-bit bit-length in the last 8 bytes of each lane's last block
    bitlen = (lens.astype(np.uint64) * _U64(8))
    ends = pad_starts[1:]  # exclusive end of each lane's padded area
    for k in range(8):
        padded[ends - 8 + k] = ((bitlen >> _U64(8 * (7 - k))) & _U64(0xFF)).astype(
            np.uint8
        )

    # big-endian 32-bit words for every block: (total_blocks, 16)
    words = (
        padded.reshape(-1, 4)[:, 0].astype(_U32) << _U32(24)
    ) | (
        padded.reshape(-1, 4)[:, 1].astype(_U32) << _U32(16)
    ) | (
        padded.reshape(-1, 4)[:, 2].astype(_U32) << _U32(8)
    ) | padded.reshape(-1, 4)[:, 3].astype(_U32)
    words = words.reshape(-1, 16)
    block_starts = pad_starts[:-1] // 64  # first block row of each lane

    h = np.tile(
        np.array(
            [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0],
            dtype=_U32,
        ),
        (n, 1),
    )
    max_blocks = int(n_blocks.max())
    with np.errstate(over="ignore"):
        if max_blocks == 1:
            _sha1_compress(h, words[block_starts])
        else:
            lanes = np.arange(n, dtype=np.int64)
            for b in range(max_blocks):
                act = lanes[n_blocks > b]
                sub = h[act]
                _sha1_compress(sub, words[block_starts[act] + b])
                h[act] = sub
    return h


def sha1_pairs(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(N, 2) uint64 = (digest[0:8], digest[8:16]) as big-endian integers."""
    h = sha1_words(data, offsets)
    out = np.empty((len(h), 2), dtype=_U64)
    out[:, 0] = (h[:, 0].astype(_U64) << _U64(32)) | h[:, 1].astype(_U64)
    out[:, 1] = (h[:, 2].astype(_U64) << _U64(32)) | h[:, 3].astype(_U64)
    return out


def sha1_digest_bytes(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(N, 20) uint8: the full SHA-1 digest bytes per message."""
    h = sha1_words(data, offsets)
    out = np.empty((len(h), 20), dtype=np.uint8)
    for w in range(5):
        for k in range(4):
            out[:, 4 * w + k] = (h[:, w] >> _U32(8 * (3 - k))).astype(np.uint8)
    return out


def sha1_pairs_of_column(col) -> np.ndarray:
    """sha1_pairs over an Arrow string/binary column."""
    data, offsets = arrow_string_buffer(col)
    return sha1_pairs(data, offsets)


def sha1_pairs_of_strings(strings) -> np.ndarray:
    """sha1_pairs over a Python list of str/bytes (test/driver helper)."""
    bs = [s.encode() if isinstance(s, str) else bytes(s) for s in strings]
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bs], out=offsets[1:])
    data = (
        np.frombuffer(b"".join(bs), dtype=np.uint8)
        if offsets[-1]
        else np.empty(0, dtype=np.uint8)
    )
    return sha1_pairs(data, offsets)


_POLY_BASE = _U64(1099511628211)


def poly_hash64(data: np.ndarray, offsets: np.ndarray, base: np.uint64 = _POLY_BASE) -> np.ndarray:
    """h_i = B^L_i + sum_k data[off_i+k] * B^(L_i-1-k)  (mod 2^64), O(total
    bytes): one power table of size Lmax+1, one weighted flat array, per-row
    wrap-safe cumsum differences. Bit-identical to the former padded-matrix
    implementation (same formula; empty rows hash to B^0 = 1 + 0 = 1... see
    below: empty rows return 1, matching the previous np.where(lens>0) rule).
    """
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=_U64)
    lens = offsets[1:] - offsets[:-1]
    lmax = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        # pow_tbl[j] = B^j mod 2^64, j in [0, lmax]
        pow_tbl = np.empty(lmax + 1, dtype=_U64)
        pow_tbl[0] = _U64(1)
        if lmax:
            np.multiply.accumulate(
                np.full(lmax, base, dtype=_U64), out=pow_tbl[1:]
            )
        total = int(lens.sum())
        if total:
            row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            within = np.arange(total, dtype=np.int64) - np.repeat(row_starts, lens)
            src_idx = np.repeat(offsets[:-1], lens) + within
            expo = np.repeat(lens - 1, lens) - within
            contrib = data[src_idx].astype(_U64) * pow_tbl[expo]
            cs = np.empty(total + 1, dtype=_U64)
            cs[0] = _U64(0)
            np.cumsum(contrib, out=cs[1:])
            flat_ends = row_starts + lens
            h = cs[flat_ends] - cs[row_starts]
        else:
            h = np.zeros(n, dtype=_U64)
        # + B^L length term; empty rows get the former sentinel 1
        h = h + np.where(lens > 0, pow_tbl[lens], _U64(1))
    return h


def poly_hash64_of_column(col, base: np.uint64 = _POLY_BASE) -> np.ndarray:
    data, offsets = arrow_string_buffer(col)
    return poly_hash64(data, offsets, base)


# 16-bit popcount LUT: level_of() and friends need popcount without a Python
# per-element loop (np.bitwise_count only exists from NumPy 2.0).
_POPCNT16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount: four 16-bit LUT gathers + add."""
    x = x.astype(_U64, copy=False)
    m = _U64(0xFFFF)
    return (
        _POPCNT16[(x & m).astype(np.int64)].astype(np.int64)
        + _POPCNT16[((x >> _U64(16)) & m).astype(np.int64)]
        + _POPCNT16[((x >> _U64(32)) & m).astype(np.int64)]
        + _POPCNT16[((x >> _U64(48)) & m).astype(np.int64)]
    )


def sha1_first64_of_tokens(col) -> np.ndarray:
    """First-8-bytes-of-SHA-1 per element, computed once per DISTINCT value
    (Arrow dictionary encode) and gathered back — bit-identical to hashing
    every element, but token arrays from natural-language splits repeat
    heavily, so the SHA-1 kernel sees the vocabulary, not the stream. Also
    shrinks the big per-call temporaries that this sandbox's page-fault
    stalls amplify."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    uh = sha1_pairs_of_column(d.dictionary)[:, 0]
    if len(uh) == 0:
        return np.empty(0, dtype=np.uint64)
    return uh[np.asarray(d.indices)]


def poly_hash64_of_tokens(col, base: np.uint64 = _POLY_BASE) -> np.ndarray:
    """poly_hash64 per element via dictionary encode + gather (see
    sha1_first64_of_tokens for why) — bit-identical, vocabulary-sized work."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    uh = poly_hash64_of_column(d.dictionary, base)
    if len(uh) == 0:
        return np.empty(0, dtype=np.uint64)
    return uh[np.asarray(d.indices)]

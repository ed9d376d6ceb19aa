"""Delta + varbyte postings codec, numpy-vectorized (no per-element Python).

Mirrors the role of Lucene's block postings encoding (reference codec is
Lucene84: index/codec/PerFieldMappingPostingFormatCodec.java:43): doc ids are
delta-encoded then varbyte-compressed; term freqs varbyte; norms are raw
byte4-encoded doc lengths (one byte per posting, like Lucene's norms field).

Varbyte layout: little-endian 7-bit groups, high bit = continuation.
"""

from __future__ import annotations

import numpy as np


def varbyte_encode_sized(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varbyte encode; returns (uint8 buffer, bytes-per-value).

    The sizes array lets callers that encoded many concatenated groups in one
    call slice the buffer back into per-group ranges without re-encoding.
    """
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bitlen/7), min 1
    bitlen = np.zeros(a.shape, dtype=np.int64)
    nz = a > 0
    bitlen[nz] = np.floor(np.log2(a[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 can under/over-shoot near powers of two for big ints; correct it
    too_low = (a >> np.minimum(bitlen, 63).astype(np.uint64)) > 0
    bitlen[too_low] += 1
    shift_down = np.maximum(bitlen - 1, 0).astype(np.uint64)
    too_high = nz & ((a >> shift_down) == 0)
    bitlen[too_high] -= 1
    nbytes = np.maximum((bitlen + 6) // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    max_b = int(nbytes.max())
    for j in range(max_b):
        sel = nbytes > j
        pos = starts[sel] + j
        chunk = (a[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        is_last = nbytes[sel] == j + 1
        out[pos] = chunk.astype(np.uint8) | np.where(is_last, 0, 0x80).astype(np.uint8)
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a non-negative int array."""
    buf, _ = varbyte_encode_sized(values)
    return buf.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = b < 128
    starts = np.empty(b.shape, dtype=bool)
    starts[0] = True
    starts[1:] = ends[:-1]
    start_idx = np.flatnonzero(starts)
    group_len = np.diff(np.append(start_idx, b.size))
    j = np.arange(b.size, dtype=np.int64) - np.repeat(start_idx, group_len)
    vals = (b & 0x7F).astype(np.uint64) << (7 * j).astype(np.uint64)
    return np.add.reduceat(vals, start_idx)


def delta_encode(sorted_vals: np.ndarray) -> bytes:
    """Delta + varbyte for a strictly-increasing int array (doc ordinals)."""
    a = np.asarray(sorted_vals, dtype=np.int64)
    if a.size == 0:
        return b""
    deltas = np.empty(a.shape, dtype=np.uint64)
    deltas[0] = a[0]
    deltas[1:] = np.diff(a).astype(np.uint64)
    return varbyte_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    d = varbyte_decode(buf)
    return np.cumsum(d.astype(np.int64))

"""Vectorized LEB128 varint encode/decode for posting blocks.

Posting blocks store docID delta-gaps and term frequencies as
concatenated LEB128 varints (7 data bits per byte, high bit =
continuation), the standard postings compression alongside delta
gaps (the reference's Lucene codecs use the same family of
techniques; we own the format since our postings live in
Parquet/Iceberg binary columns).

Both directions are pure NumPy — no per-value Python loops. The
encoder loops over *byte positions* (<= 9 iterations, each fully
vectorized); the decoder reconstructs values with
``np.add.reduceat`` over continuation-bit group boundaries.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 9  # 63 bits / 7


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int64 array as concatenated LEB128 varints."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    if int(v.min()) < 0:
        raise ValueError("varint_encode requires non-negative values")
    u = v.astype(np.uint64)
    # number of 7-bit groups per value
    nbytes = np.ones(u.shape, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nbytes += (u >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    # start offset of each value's first byte
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for k in range(_MAX_BYTES):
        mask = nbytes > k
        if not mask.any():
            break
        idx = starts[mask] + k
        chunk = (u[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode concatenated LEB128 varints back to an int64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated varint stream")
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    # position of each byte within its varint group
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.int64)

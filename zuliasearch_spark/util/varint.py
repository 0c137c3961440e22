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


def varint_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode and also return each value's starting byte offset.

    ``offsets`` has len(values)+1 entries; slice ``buf[offsets[i]:offsets[j]]``
    to get the encoding of values[i:j] — lets a caller encode a whole
    partition in ONE vectorized pass and slice out per-block payloads.
    """
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    if int(v.min()) < 0:
        raise ValueError("varint_encode requires non-negative values")
    u = v.astype(np.uint64)
    nbytes = np.ones(u.shape, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nbytes += (u >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]
    for k in range(_MAX_BYTES):
        mask = nbytes > k
        if not mask.any():
            break
        idx = starts[mask] + k
        chunk = (u[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes(), offsets


def segmented_cumsum(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each segment start (vectorized).

    Used to turn concatenated delta-gap streams back into absolute
    docIDs: each posting block's first value is absolute, the rest are
    gaps, so a per-block cumsum reconstructs docIDs for ALL blocks of
    a term in one pass.
    """
    if values.size == 0:
        return values.astype(np.int64)
    c = np.cumsum(values, dtype=np.int64)
    base = np.zeros_like(c)
    # subtract, within each segment, the cumsum just before the segment
    prior = np.where(seg_starts > 0, c[seg_starts - 1], 0)
    seg_lens = np.diff(np.concatenate((seg_starts, [values.size])))
    base = np.repeat(prior, seg_lens)
    return c - base


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

"""Lucene SmallFloat 4-bit float norm quantization, vectorized in NumPy.

Lucene's ``BM25Similarity.computeNorm`` stores a document's field
length in ONE byte via ``SmallFloat.intToByte4`` (3 mantissa bits +
implicit leading bit + 5 exponent bits); query-time scoring decodes
the quantized length with ``byte4ToInt``. Rank-identical BM25 versus
the reference (zuliaio/zuliasearch delegates scoring to Lucene
``BM25Similarity``, zulia-server .../index/ShardReader.java:562-570)
therefore requires the exact same encode/decode, re-implemented here
from the published Lucene algorithm (org.apache.lucene.util.SmallFloat,
public Apache-2.0 source).

All functions are vectorized over int64 NumPy arrays; no per-row
Python.
"""

from __future__ import annotations

import numpy as np


def _num_bits(v: np.ndarray) -> np.ndarray:
    """Bit length of each non-negative int64 value (0 -> 0 bits).

    Uses ``frexp``: for v > 0 exactly representable in float64
    (always true here; field lengths < 2**53), frexp returns exponent
    e with v = m * 2**e, 0.5 <= m < 1, so bit_length == e.
    """
    _, e = np.frexp(v.astype(np.float64))
    return np.where(v > 0, e, 0).astype(np.int64)


def long_to_int4(v: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.longToInt4``."""
    v = np.asarray(v, dtype=np.int64)
    if v.size and int(v.min()) < 0:
        raise ValueError("longToInt4 requires non-negative input")
    nbits = _num_bits(v)
    shift = np.maximum(nbits - 4, 0)
    # keep 3 stored mantissa bits (the leading 1 is implicit) + biased shift
    encoded = ((v >> shift) & 0x07) | ((shift + 1) << 3)
    return np.where(nbits < 4, v, encoded).astype(np.int64)


def int4_to_long(b: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.int4ToLong``."""
    b = np.asarray(b, dtype=np.int64)
    bits = b & 0x07
    shift = (b >> 3) - 1
    decoded = (bits | 0x08) << np.maximum(shift, 0)
    return np.where(shift == -1, bits, decoded).astype(np.int64)


def int_to_byte4(lengths: np.ndarray) -> np.ndarray:
    """Encode field lengths to the 1-byte norm (``SmallFloat.intToByte4``)."""
    enc = long_to_int4(np.asarray(lengths, dtype=np.int64))
    if enc.size and int(enc.max()) > 255:
        raise ValueError("field length too large for byte4 norm")
    return enc.astype(np.uint8)


def byte4_to_int(norms: np.ndarray) -> np.ndarray:
    """Decode the 1-byte norm back to the quantized field length."""
    b = np.asarray(norms).astype(np.int64) & 0xFF
    return int4_to_long(b)


# Lucene BM25Similarity precomputes LENGTH_TABLE[256] once; we expose the
# same table so scoring kernels can do a cheap take() instead of decoding.
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256, dtype=np.int64))


def quantize_length(lengths: np.ndarray) -> np.ndarray:
    """Round-trip a field length through the 1-byte norm (encode+decode).

    This is the effective document length Lucene BM25 scores with.
    """
    return LENGTH_TABLE[int_to_byte4(lengths)]

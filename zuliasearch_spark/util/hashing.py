"""Hashing utilities: Zulia-compatible djb2 shard routing, vectorized.

The reference routes every document to a shard with a 64-bit djb2
hash over the uniqueId's UTF-16 code units followed by
``Math.abs(hash) % numOfShards``
(zulia-common/src/main/java/io/zulia/util/ShardUtil.java:3-20). We
replicate that exactly so a fixture sharded here lands on the same
shard the reference would pick.

``djb2_hash_series`` is vectorized: all strings are encoded into one
UTF-16LE buffer and the polynomial hash
``h = 5381*33^n + sum(c_i * 33^(n-1-i)) (mod 2^64)`` is evaluated
with segmented NumPy reductions — no per-row Python in the indexing
hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U64_33 = np.uint64(33)
_SEED = np.uint64(5381)


def djb2_hash(s: str) -> int:
    """Scalar Java-long djb2 over UTF-16 code units (ShardUtil.djb2Hash)."""
    h = 5381
    for unit in np.frombuffer(s.encode("utf-16-le"), dtype="<u2"):
        h = (h * 33 + int(unit)) & 0xFFFFFFFFFFFFFFFF
    # reinterpret as signed 64-bit (Java long)
    return h - (1 << 64) if h >= (1 << 63) else h


def find_shard_for_unique_id(unique_id: str, num_shards: int) -> int:
    """Scalar ShardUtil.findShardForUniqueId: abs(djb2) % numShards."""
    return int(abs(djb2_hash(unique_id)) % num_shards)


def _pow33(n: int) -> np.ndarray:
    """[33^0, 33^1, ..., 33^n] mod 2^64."""
    p = np.empty(n + 1, dtype=np.uint64)
    p[0] = 1
    np.multiply.accumulate(np.full(n, _U64_33, dtype=np.uint64), out=p[1:])
    return p


def djb2_hash_series(strings: pd.Series) -> np.ndarray:
    """Vectorized djb2 over a string Series → signed int64 array."""
    encoded = strings.astype(str).str.encode("utf-16-le")
    lens_units = (encoded.str.len() // 2).to_numpy(dtype=np.int64)
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    buf = np.frombuffer(b"".join(encoded.to_numpy()), dtype="<u2").astype(np.uint64)
    max_len = int(lens_units.max()) if n else 0
    pows = _pow33(max_len)
    ends = np.cumsum(lens_units)
    starts = ends - lens_units
    # weight of code unit at absolute position j (string i): 33^(len_i-1-(j-start_i))
    within = np.arange(buf.size, dtype=np.int64) - np.repeat(starts, lens_units)
    exps = np.repeat(lens_units - 1, lens_units) - within
    terms = buf * pows[exps]
    with np.errstate(over="ignore"):
        sums = np.zeros(n, dtype=np.uint64)
        nonempty = lens_units > 0
        if buf.size:
            # reduceat needs valid start indices; compute only for non-empty rows
            red = np.add.reduceat(terms, starts[nonempty])
            sums[nonempty] = red
        h = _SEED * pows[lens_units] + sums
    return h.view(np.int64)


def shard_for_series(unique_ids: pd.Series, num_shards: int) -> np.ndarray:
    """Vectorized ShardUtil.findShardForUniqueId over a Series."""
    h = djb2_hash_series(unique_ids)
    return (np.abs(h) % num_shards).astype(np.int32)


# ---------------------------------------------------------------------
# MurmurHash3 x64 128 — Austin Appleby's public-domain MurmurHash3.cpp,
# the function Lucene's MinHashFilter ports (murmurhash3_x64_128) and
# hashes term bytes with. Verified against the published mmh3 test
# vectors: hash64("foo") == (-2129773440516405919, 9128664383759220103)
# and hash128("foo") == 168394135621993849475852668931176482145.

_M64 = (1 << 64) - 1
_MM3_C1 = 0x87C37B91114253D5
_MM3_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """128-bit MurmurHash3 (x64 variant) → (val1, val2) unsigned.

    Pure-Python reference port; callers hash O(distinct terms), never
    per row, so this stays off the hot path.
    """
    length = len(data)
    h1 = h2 = seed & _M64
    nblocks = length // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _MM3_C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _MM3_C2) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _MM3_C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _MM3_C1) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16 :]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * _MM3_C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _MM3_C1) & _M64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * _MM3_C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _MM3_C2) & _M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2

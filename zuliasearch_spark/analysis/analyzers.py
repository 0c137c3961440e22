"""Vectorized analyzer chains (text → terms), NumPy byte kernels.

The reference analyzes text with Lucene tokenizer + filter chains
configured per field (ZuliaFieldAnalyzer.java:51-160, settings enum
zulia_index.proto:280-315, per-field dispatch
ZuliaPerFieldAnalyzer.java:51-110). This module re-expresses those
chains as *columnar* transforms. Tokenization is the hot path of an
index build at 10^12-doc scale, so it runs as a byte-level NumPy
kernel directly over the Arrow string buffer: char-class lookup
tables find token boundaries (including camelCase boundaries for
CODE_SPLIT) in a handful of O(bytes) vectorized passes; tokens are
gathered contiguously and dictionary-encoded by Arrow C++. No
per-row Python, no per-token regex.

Tokenizer semantics:

- STANDARD: maximal runs of ``[A-Za-z0-9_]`` or non-ASCII bytes — an
  ASCII-oriented approximation of Lucene's UAX#29 StandardTokenizer
  where, as in UAX#29, underscore (ExtendNumLet) *joins* words, so
  ``shard_reader`` is one token until CODE_SPLIT breaks it. UTF-8
  continuation/lead bytes are treated as word bytes so non-ASCII
  runs stay intact.
- WHITESPACE: maximal runs of non-whitespace (WhitespaceTokenizer).
- KEYWORD: the whole value is one token (KeywordTokenizer).

Filter semantics:

- CODE_SPLIT: code-aware identifier splitting — underscores become
  separators and camelCase / ACRONYMCase / letter↔digit boundaries
  become token breaks (``parseQueryNode`` → ``parse query node``,
  ``HTTPServer2`` → ``http server 2``); the Spark analogue of
  Lucene's WordDelimiter/CONCAT_ALL family
  (ZuliaFieldAnalyzer.java:145-147) specialized for source code.
  Parts replace the original token (generateWordParts, no
  preserveOriginal). Fused into the tokenizer byte kernel.
- LOWERCASE / UPPERCASE: ASCII case fold, fused into the kernel
  (applied after boundary detection, so case boundaries survive).
- ASCII_FOLDING: accent strip, applied to the term dictionary only.
- STOPWORDS: Lucene's classic English list, dropped by dictionary
  code — an O(1)-per-token mask, never a string compare.

Document field length (BM25 norm) = number of emitted tokens after
all filters, matching how Lucene's norm counts emitted positions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from zuliasearch_spark.config import (
    ASCII_FOLDING,
    BRITISH_US,
    CASE_PROTECTED_WORDS,
    CODE_SPLIT,
    CONCAT_ALL,
    ENGLISH_MIN_STEM,
    ENGLISH_POSSESSIVE,
    FIVE_FIVE_SHINGLE,
    FOUR_FOUR_SHINGLE,
    GERMAN_NORMALIZATION,
    KEYWORD,
    KSTEM,
    LOWERCASE,
    MINHASH,
    SNOWBALL_STEM,
    STANDARD,
    STOPWORDS,
    THREE_THREE_SHINGLE,
    TWO_TWO_SHINGLE,
    UPPERCASE,
    WHITESPACE,
    AnalyzerSettings,
)
from zuliasearch_spark.util.alloc import tune_allocators

# every process that tokenizes (driver or Spark python worker) keeps
# its allocator pools resident — see util/alloc.py for the measured
# refault pathology this avoids
tune_allocators()

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (public Apache-2.0 list)
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_ASCII_FOLD_TABLE = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ",
    "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY",
)

# ---- byte class tables -------------------------------------------------
_B = np.arange(256, dtype=np.uint8)
_IS_LOWER = (_B >= ord("a")) & (_B <= ord("z"))
_IS_UPPER = (_B >= ord("A")) & (_B <= ord("Z"))
_IS_DIGIT = (_B >= ord("0")) & (_B <= ord("9"))
_IS_HI = _B >= 0x80  # UTF-8 non-ASCII: keep runs together
_IS_SPACE = np.zeros(256, dtype=bool)
_IS_SPACE[[9, 10, 11, 12, 13, 32]] = True

_WORD_STANDARD = _IS_LOWER | _IS_UPPER | _IS_DIGIT | _IS_HI | (_B == ord("_"))
_WORD_CODE = _IS_LOWER | _IS_UPPER | _IS_DIGIT | _IS_HI  # '_' splits
_WORD_WS = ~_IS_SPACE

_TO_LOWER = _B.copy()
_TO_LOWER[_IS_UPPER] = _B[_IS_UPPER] + 32
_TO_UPPER = _B.copy()
_TO_UPPER[_IS_LOWER] = _B[_IS_LOWER] - 32


@dataclass
class TokenStream:
    """Dictionary-encoded token stream: terms[i] = vocab[codes[i]].

    ``pos`` is the token's position within its document, assigned
    BEFORE dictionary filters run — so dropping a stopword leaves a
    position gap, exactly like Lucene's StopFilter position
    increments (phrase queries then see the gap).
    """

    doc_idx: np.ndarray  # int64, position into the input Series
    codes: np.ndarray  # int64 into vocab
    vocab: pa.Array  # unique terms (Arrow string array)
    pos: np.ndarray | None = None  # int64 position within document

    def __len__(self) -> int:
        return len(self.codes)

    def terms(self) -> np.ndarray:
        """Materialize the term stream (object array of str)."""
        return pc.take(self.vocab, pa.array(self.codes)).to_numpy(zero_copy_only=False)


def _string_buffer(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(bytes uint8, per-doc end offsets int64) of an Arrow string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data_buf = arr.buffers()[2]
    if data_buf is None:
        return np.empty(0, dtype=np.uint8), offs - offs[0]
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return data[offs[0] : offs[-1]].copy(), offs - offs[0]


# Chunk target for the byte kernel: the tokenizer makes ~20 passes
# over the text buffer, so keeping a chunk's working set inside the
# CPU cache beats streaming the whole partition through DRAM — on a
# memory-bandwidth-limited host this is ~15x (measured: 8192 docs in
# one pass 92s vs 256-doc chunks 6s). 256KB keeps the working set in
# PRIVATE L2 rather than the shared L3, which is what lets 16-32
# parallel executor workers scale instead of fighting over DRAM
# (measured: aggregate tokenize throughput 2MB→256KB chunks at 32
# procs: 3.8k→5.2k docs/s on this host).
_CHUNK_BYTES = 256 << 10


def _as_arrow(texts) -> pa.Array:
    """pd.Series | pa.Array | pa.ChunkedArray → flat non-null pa.string.

    Accepting Arrow directly lets the Spark build path (mapInArrow)
    feed the kernel WITHOUT materializing Python str objects per row —
    the Arrow→pandas→Arrow round trip costs more than tokenization.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        if pa.types.is_large_string(texts.type):
            texts = texts.cast(pa.string())
        if texts.null_count:
            texts = pc.fill_null(texts, "")
        return texts
    return pa.array(texts.fillna("").astype(str), type=pa.string())


_HTML_ENTITIES = (
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&nbsp;", " "),
)


def _strip_html(arr: pa.Array) -> pa.Array:
    """HTMLStripCharFilter analogue (AnalyzerSettings.stripHTML,
    zulia_index.proto:311): tags → spaces, common entities decoded —
    an approximation of Lucene's full character filter (scripts /
    numeric entities are left as text), Arrow-side regex so the byte
    kernel still sees a plain string column."""
    arr = pc.replace_substring_regex(arr, pattern="<[^>]*>", replacement=" ")
    for ent, rep in _HTML_ENTITIES:
        arr = pc.replace_substring(arr, pattern=ent, replacement=rep)
    return arr


def _tokenize_encode(texts, settings: AnalyzerSettings) -> TokenStream:
    arr = _as_arrow(texts)
    if getattr(settings, "strip_html", False):
        arr = _strip_html(arr)

    # CODE_SPLIT applies only under the STANDARD tokenizer (the
    # WHITESPACE/KEYWORD chains keep raw tokens intact, matching the
    # per-tokenizer filter wiring of ZuliaFieldAnalyzer.java:51-160)
    code_split = CODE_SPLIT in settings.filters and settings.tokenizer == STANDARD
    lower = LOWERCASE in settings.filters
    upper = UPPERCASE in settings.filters

    if settings.tokenizer == KEYWORD:
        if lower:
            arr = pc.utf8_lower(arr)
        elif upper:
            arr = pc.utf8_upper(arr)
        dict_arr = pc.dictionary_encode(arr)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.arange(len(arr), dtype=np.int64)
        nonempty = pc.utf8_length(dict_arr.dictionary).to_numpy(zero_copy_only=False) > 0
        keep = nonempty[codes]
        return TokenStream(
            doc_idx[keep], codes[keep], dict_arr.dictionary, np.zeros(int(keep.sum()), dtype=np.int64)
        )

    if settings.tokenizer == WHITESPACE:
        word = _WORD_WS
    elif settings.tokenizer == STANDARD:
        word = _WORD_CODE if code_split else _WORD_STANDARD
    else:
        raise ValueError(f"unknown tokenizer: {settings.tokenizer}")

    # cache-sized chunks; ONE dictionary_encode over the concatenated
    # token stream at the end (Arrow C++, not a per-chunk cost)
    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx_parts: list[np.ndarray] = []
    tok_parts: list[pa.Array] = []
    start = 0
    n = len(arr)
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=cum[1:])
    while start < n:
        end = int(np.searchsorted(cum, cum[start] + _CHUNK_BYTES, side="left"))
        end = max(end, start + 1)
        d_idx, toks = _tokenize_chunk(arr.slice(start, end - start), word, code_split, lower, upper)
        if len(toks):
            doc_idx_parts.append(d_idx + start)
            tok_parts.append(toks)
        start = end
    if not tok_parts:
        return TokenStream(
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            np.empty(0, dtype=np.int64),
        )
    tok_arr = pa.concat_arrays(tok_parts) if len(tok_parts) > 1 else tok_parts[0]
    doc_idx = np.concatenate(doc_idx_parts) if len(doc_idx_parts) > 1 else doc_idx_parts[0]
    dict_arr = pc.dictionary_encode(tok_arr)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # token position within its document (doc_idx is ascending; chunk
    # boundaries are document boundaries so the restart is exact)
    idxs = np.arange(doc_idx.size, dtype=np.int64)
    new_doc = np.ones(doc_idx.size, dtype=bool)
    new_doc[1:] = doc_idx[1:] != doc_idx[:-1]
    run_start = np.maximum.accumulate(np.where(new_doc, idxs, 0))
    pos = idxs - run_start
    return TokenStream(doc_idx, codes, dict_arr.dictionary, pos)


def _tokenize_chunk(
    arr: pa.Array, word: np.ndarray, code_split: bool, lower: bool, upper: bool
) -> tuple[np.ndarray, pa.Array]:
    """Tokenize one cache-sized slice → (doc_idx, token StringArray)."""
    data, doc_offs = _string_buffer(arr)
    _empty = (np.empty(0, dtype=np.int64), pa.array([], type=pa.string()))
    if data.size == 0:
        return _empty
    is_word = word[data]
    prev_word = np.empty_like(is_word)
    prev_word[0] = False
    prev_word[1:] = is_word[:-1]
    # a document boundary always breaks a token
    inner_starts = doc_offs[1:-1]
    inner_starts = inner_starts[inner_starts < data.size]
    prev_word[inner_starts] = False

    start_mask = is_word & ~prev_word
    if code_split:
        lo_dig = _IS_LOWER | _IS_DIGIT
        up = _IS_UPPER
        prev = np.empty_like(data)
        prev[0] = 0
        prev[1:] = data[:-1]
        nxt = np.empty_like(data)
        nxt[-1] = 0
        nxt[:-1] = data[1:]
        camel = up[data] & lo_dig[prev]  # aB | 1B
        acro = up[data] & up[prev] & _IS_LOWER[nxt]  # ABc -> A|Bc
        dig = (_IS_DIGIT[data] & (_IS_LOWER[prev] | up[prev])) | (
            (_IS_LOWER[data] | up[data]) & _IS_DIGIT[prev]
        )
        extra = (camel | acro | dig) & is_word & prev_word
        extra[inner_starts] = False
        start_mask = start_mask | extra

    tok_starts = np.flatnonzero(start_mask).astype(np.int64)
    if tok_starts.size == 0:
        return _empty
    # token end = end of its word-run, or the next (camel) token start
    word_end_positions = np.flatnonzero(~np.concatenate((is_word[1:], [False])) & is_word) + 1
    tok_ends = word_end_positions[np.searchsorted(word_end_positions, tok_starts, side="right")]
    # a camel boundary also ends the previous token:
    next_start = np.empty(tok_starts.size, dtype=np.int64)
    next_start[:-1] = tok_starts[1:]
    next_start[-1] = data.size
    tok_ends = np.minimum(tok_ends, next_start)

    if lower:
        data = _TO_LOWER[data]
    elif upper:
        data = _TO_UPPER[data]

    lens = (tok_ends - tok_starts).astype(np.int32)
    gather = np.repeat(tok_starts, lens)
    gather += _ranges_within(lens)
    values = data[gather]
    offsets = np.zeros(tok_starts.size + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    tok_arr = pa.StringArray.from_buffers(
        tok_starts.size, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes())
    )
    doc_idx = np.searchsorted(doc_offs, tok_starts, side="right").astype(np.int64) - 1
    return doc_idx, tok_arr


def _ranges_within(lens: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] for an int array of lengths (int32)."""
    total = int(lens.sum())
    out = np.ones(total, dtype=np.int32)
    if total == 0:
        return out
    out[0] = 0
    starts = np.cumsum(lens[:-1], dtype=np.int64)
    out[starts] = np.int32(1) - lens[:-1]
    return np.cumsum(out, dtype=np.int32)


_SHINGLE_SIZES = {
    TWO_TWO_SHINGLE: 2,
    THREE_THREE_SHINGLE: 3,
    FOUR_FOUR_SHINGLE: 4,
    FIVE_FIVE_SHINGLE: 5,
}


def _remap_vocab(ts: TokenStream, new_terms: pd.Series, protected: set[int]) -> tuple[TokenStream, set[int]]:
    """Re-encode the stream after a per-term vocab transform; drop
    tokens whose term became empty. Re-derives the protected code set
    through the remap."""
    dict2 = pc.dictionary_encode(pa.array(new_terms, type=pa.string()))
    remap = dict2.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    codes = remap[ts.codes]
    new_protected = {int(remap[c]) for c in protected if c < remap.size}
    nonempty = pc.utf8_length(dict2.dictionary).to_numpy(zero_copy_only=False) > 0
    keep = nonempty[codes]
    if keep.all():
        return (
            TokenStream(ts.doc_idx, codes, dict2.dictionary, ts.pos),
            new_protected,
        )
    return (
        TokenStream(
            ts.doc_idx[keep],
            codes[keep],
            dict2.dictionary,
            None if ts.pos is None else ts.pos[keep],
        ),
        new_protected,
    )


def _map_terms(
    ts: TokenStream, protected: set[int], fn, honor_protected: bool = True
) -> tuple[TokenStream, set[int]]:
    """Apply a per-term function over the vocab. Stemmers honor the
    CASE_PROTECTED_WORDS keyword-marker set (KeywordMarkerFilter
    semantics: marked terms skip stemming); normalizers don't, but
    the marker set is carried through the re-encode either way."""
    vocab = ts.vocab.to_pylist()
    out = [
        t if (honor_protected and i in protected) else fn(t)
        for i, t in enumerate(vocab)
    ]
    return _remap_vocab(ts, pd.Series(out, dtype=object), protected)


def _shingle(ts: TokenStream, k: int) -> TokenStream:
    """Word shingles of exactly size k, outputUnigrams=false (Lucene
    ShingleFilter as wired at ZuliaFieldAnalyzer.java:92-113). Holes
    left by stopword removal are filled with Lucene's "_" token;
    shingles start at real (non-filler) tokens."""
    if len(ts) == 0:
        return ts
    # densify: one slot per position, "_" for holes
    order = np.lexsort((ts.pos, ts.doc_idx))
    doc = ts.doc_idx[order]
    pos = ts.pos[order]
    codes = ts.codes[order]
    new_doc = np.ones(doc.size, dtype=bool)
    new_doc[1:] = doc[1:] != doc[:-1]
    doc_ids = doc[new_doc]
    max_pos = np.maximum.reduceat(pos, np.flatnonzero(new_doc))
    dense_lens = max_pos + 1
    starts = np.zeros(doc_ids.size, dtype=np.int64)
    np.cumsum(dense_lens[:-1], out=starts[1:])
    total = int(dense_lens.sum())
    filler_code = len(ts.vocab)
    dense = np.full(total, filler_code, dtype=np.int64)
    doc_rank = np.cumsum(new_doc) - 1
    dense[starts[doc_rank] + pos] = codes
    vocab_f = pa.concat_arrays([ts.vocab, pa.array(["_"], type=pa.string())])
    # windows fully inside one document
    ends = starts + dense_lens
    win_start = np.arange(total - k + 1, dtype=np.int64) if total >= k else np.empty(0, np.int64)
    if win_start.size:
        win_doc = np.searchsorted(ends, win_start, side="right")
        ok = (win_start + k) <= ends[win_doc]
        # start at a real token (not a filler slot)
        ok &= dense[win_start] != filler_code
        win_start = win_start[ok]
        win_doc = win_doc[ok]
    else:
        win_doc = np.empty(0, np.int64)
    if win_start.size == 0:
        return TokenStream(
            np.empty(0, np.int64), np.empty(0, np.int64),
            pa.array([], type=pa.string()), np.empty(0, np.int64),
        )
    parts = [
        pc.take(vocab_f, pa.array(dense[win_start + j], type=pa.int64()))
        for j in range(k)
    ]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, " ")
    dict2 = pc.dictionary_encode(joined)
    return TokenStream(
        doc_ids[win_doc],
        dict2.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        dict2.dictionary,
        (win_start - starts[win_doc]).astype(np.int64),
    )


_MINHASH_BUCKETS = 512
# Lucene MinHashFilter: bucketSize = (1<<32)/bucketCount, rounded up on
# remainder; 2^32/512 divides exactly → 8388608
_MINHASH_BUCKET_SIZE = (1 << 32) // _MINHASH_BUCKETS


def _minhash_stream(ts: TokenStream) -> TokenStream:
    """MINHASH filter: per document, bucketed min-hash fingerprint
    tokens over the incoming stream — Lucene MinHashFilter with the
    MinHashFilterFactory defaults the reference instantiates
    (ZuliaFieldAnalyzer.java:139-141): hashCount=1, bucketCount=512,
    hashSetSize=1, withRotation. Parity with the Lucene filter:

    - terms hash with murmur3_x64_128 over their UTF-16LE bytes
      (MinHashFilter.murmurhash3_x64_128 / getBytes);
    - the bucket is the top 32 bits of val2 divided by
      bucketSize=2^32/512 (incrementToken's
      ``(rehashed.val2 >>> 32) / bucketSize``);
    - each bucket keeps the unsigned-least (val1, val2) pair
      (LongPair.compareTo);
    - withRotation fills every empty bucket from the next non-empty
      bucket to its right, wrapping, so every document emits exactly
      512 fingerprint positions (repeats collapse to one term with
      tf>1, exactly like the Lucene stream).

    DOCUMENTED DEVIATION (cosmetic): Lucene additionally folds the
    hash-function index through combineOrdered(hash, getIntHash(i))
    even at hashCount=1 and emits the 128-bit value as UTF-16 chars;
    this emits the raw murmur3 value as 32 hex digits. Both are
    term-set-preserving bijections of the same hash, so bucket
    occupancy, tf profile, and retrieval behavior match; only the
    literal token spelling differs (both sides of our engine run the
    same chain)."""
    from zuliasearch_spark.util.hashing import murmur3_x64_128

    if len(ts) == 0:
        return ts
    vocab = ts.vocab.to_pylist()
    hv = np.empty((len(vocab), 2), dtype=np.uint64)
    for i, t in enumerate(vocab):  # O(distinct terms), not per row
        v1, v2 = murmur3_x64_128(t.encode("utf-16-le"))
        hv[i, 0] = v1
        hv[i, 1] = v2
    v1 = hv[ts.codes, 0]
    v2 = hv[ts.codes, 1]
    bucket = ((v2 >> np.uint64(32)) // np.uint64(_MINHASH_BUCKET_SIZE)).astype(np.int64)
    # unsigned-lexicographic min per (doc, bucket)
    order = np.lexsort((v2, v1, bucket, ts.doc_idx))
    d_s, b_s = ts.doc_idx[order], bucket[order]
    first = np.ones(order.size, dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (b_s[1:] != b_s[:-1])
    sel = order[first]  # sorted by (doc, bucket)
    docs_min, buck_min = ts.doc_idx[sel], bucket[sel]
    toks = pa.array(
        [f"{int(a):016x}{int(b):016x}" for a, b in zip(v1[sel], v2[sel])],
        type=pa.string(),
    )
    dict2 = pc.dictionary_encode(toks)
    sel_codes = dict2.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # rotation fill: bucket b's source is the first non-empty bucket
    # >= b within the doc, wrapping to the doc's first non-empty
    doc_starts = np.flatnonzero(np.r_[True, docs_min[1:] != docs_min[:-1]])
    doc_ends = np.r_[doc_starts[1:], docs_min.size]
    all_b = np.arange(_MINHASH_BUCKETS, dtype=np.int64)
    out_codes = np.empty(doc_starts.size * _MINHASH_BUCKETS, dtype=np.int64)
    out_docs = np.empty_like(out_codes)
    for gi, (s, e) in enumerate(zip(doc_starts, doc_ends)):
        idx = np.searchsorted(buck_min[s:e], all_b)
        idx[idx == e - s] = 0
        o = gi * _MINHASH_BUCKETS
        out_codes[o : o + _MINHASH_BUCKETS] = sel_codes[s + idx]
        out_docs[o : o + _MINHASH_BUCKETS] = docs_min[s]
    return TokenStream(
        out_docs,
        out_codes,
        dict2.dictionary,
        np.tile(all_b, doc_starts.size),
    )


def _apply_vocab_filters(ts: TokenStream, settings: AnalyzerSettings) -> TokenStream:
    """Post-tokenize filters, applied IN DECLARED ORDER like
    ZuliaFieldAnalyzer.java:76-160 chains Lucene filters. Per-term
    transforms act on the dictionary (O(distinct terms)); shingles /
    minhash transform the stream."""
    from zuliasearch_spark.analysis import stem as _stem

    protected: set[int] = set()
    for f in settings.filters:
        if len(ts.vocab) == 0:
            break
        if f == ASCII_FOLDING:
            folded = pd.Series(ts.vocab.to_pandas()).str.translate(_ASCII_FOLD_TABLE)
            ts, protected = _remap_vocab(ts, folded, protected)
        elif f == STOPWORDS:
            stop = pa.array(sorted(ENGLISH_STOPWORDS), type=pa.string())
            is_stop = pc.is_in(ts.vocab, value_set=stop).to_numpy(zero_copy_only=False)
            keep = ~is_stop[ts.codes]
            # positions keep their pre-filter values: removed stopwords
            # leave gaps (Lucene StopFilter position increments)
            ts = TokenStream(
                ts.doc_idx[keep], ts.codes[keep], ts.vocab,
                None if ts.pos is None else ts.pos[keep],
            )
        elif f == ENGLISH_POSSESSIVE:
            ts, protected = _map_terms(ts, protected, _stem.english_possessive, honor_protected=False)
        elif f == ENGLISH_MIN_STEM:
            ts, protected = _map_terms(ts, protected, _stem.english_minimal_stem)
        elif f == SNOWBALL_STEM:
            ts, protected = _map_terms(ts, protected, _stem.porter2_stem)
        elif f == KSTEM:
            from zuliasearch_spark.analysis.kstem import kstem_stem

            ts, protected = _map_terms(ts, protected, kstem_stem)
        elif f == GERMAN_NORMALIZATION:
            ts, protected = _map_terms(ts, protected, _stem.german_normalize, honor_protected=False)
        elif f == BRITISH_US:
            m = _stem.BRITISH_US_MAP
            ts, protected = _map_terms(ts, protected, lambda t: m.get(t, t), honor_protected=False)
        elif f == CASE_PROTECTED_WORDS:
            # KeywordMarkerFilter: mark terms so later stemmers skip them
            prot = pa.array(sorted(_stem.CASE_PROTECTED_WORDS), type=pa.string())
            mask = pc.is_in(ts.vocab, value_set=prot).to_numpy(zero_copy_only=False)
            protected |= set(np.flatnonzero(mask).tolist())
        elif f == CONCAT_ALL:
            # WordDelimiterGraphFilter(CATENATE_ALL): each token's
            # alphanumeric subwords catenated — delimiters removed
            joined = pd.Series(ts.vocab.to_pandas()).str.replace(
                r"[\W_]+", "", regex=True
            )
            ts, protected = _remap_vocab(ts, joined, protected)
        elif f in _SHINGLE_SIZES:
            ts = _shingle(ts, _SHINGLE_SIZES[f])
            protected = set()
        elif f == MINHASH:
            ts = _minhash_stream(ts)
            protected = set()
        # LOWERCASE / UPPERCASE / CODE_SPLIT are fused into the
        # tokenizer kernel; unknown names were validated at config time
    return ts


def tokenize(texts: pd.Series, settings: AnalyzerSettings) -> TokenStream:
    """Full analyzer chain → dictionary-encoded token stream."""
    return _apply_vocab_filters(_tokenize_encode(texts, settings), settings)


def analyze_series(texts: pd.Series, settings: AnalyzerSettings) -> tuple[np.ndarray, np.ndarray]:
    """Analyze a Series of documents.

    Returns ``(doc_idx, terms)``: parallel arrays of the token stream
    in document order; ``doc_idx`` indexes positionally into ``texts``.
    """
    ts = tokenize(texts, settings)
    return ts.doc_idx, ts.terms()


def term_freqs(
    texts: pd.Series, settings: AnalyzerSettings
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Per-document term frequencies for a Series of documents.

    Returns ``(doc_idx, term, tf, dl)``: the first three parallel over
    distinct (document, term) pairs (``term`` is an Arrow string
    array), ``dl`` the per-document emitted-token count (len ==
    len(texts)) — the BM25 field length.
    """
    return _agg_pairs(tokenize(texts, settings), len(texts))


def _agg_pairs(ts: TokenStream, n_docs: int):
    """(doc_idx, term, tf, dl) aggregation of a token stream."""
    dl = np.bincount(ts.doc_idx, minlength=n_docs).astype(np.int64)
    if len(ts) == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, pa.array([], type=pa.string()), empty, dl
    nv = np.int64(len(ts.vocab))
    key = ts.doc_idx * nv + ts.codes
    uk, counts = np.unique(key, return_counts=True)
    out_doc = (uk // nv).astype(np.int64)
    out_term = pc.take(ts.vocab, pa.array(uk % nv, type=pa.int64()))
    return out_doc, out_term, counts.astype(np.int64), dl


def term_freqs_positions(
    texts, settings: AnalyzerSettings
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Like :func:`term_freqs` plus the flat position stream.

    Returns ``(doc_idx, term, tf, dl, pos_flat)``: the first three
    parallel over distinct (document, term) pairs ordered by
    (document, term-code) ascending; ``pos_flat`` holds each pair's
    ascending positions concatenated in pair order (run lengths =
    ``tf``) — the layout the block encoder needs for the positions
    stream.
    """
    return _agg_pairs_positions(tokenize(texts, settings), len(texts))


def _agg_pairs_positions(ts: TokenStream, n_docs: int):
    """(doc_idx, term, tf, dl, pos_flat) aggregation of a token
    stream whose positions are per-doc ascending in stream order."""
    dl = np.bincount(ts.doc_idx, minlength=n_docs).astype(np.int64)
    if len(ts) == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, pa.array([], type=pa.string()), empty, dl, empty
    # one stable sort of the packed (doc, code) key + ONE gather (the
    # positions); the stream is already position-ordered so stability
    # keeps each pair's positions ascending. Minimizing passes
    # matters: this runs over every token of every document.
    nv = np.int64(len(ts.vocab))
    key = ts.doc_idx * nv + ts.codes
    order = np.argsort(key, kind="stable")
    ks = key[order]
    p = ts.pos[order]
    new_pair = np.ones(ks.size, dtype=bool)
    np.not_equal(ks[1:], ks[:-1], out=new_pair[1:])
    starts = np.flatnonzero(new_pair)
    tf = np.diff(np.concatenate((starts, [ks.size]))).astype(np.int64)
    uk = ks[starts]
    out_doc = (uk // nv).astype(np.int64)
    out_term = pc.take(ts.vocab, pa.array(uk % nv, type=pa.int64()))
    return out_doc, out_term, tf, dl, p.astype(np.int64, copy=False)


# Lucene's gap between the position streams of a field's values —
# ZuliaFieldAnalyzer.getPositionIncrementGap returns 100, so phrases,
# proximity windows, and shingles can never match ACROSS two values
# (a space-join would weld values together: cross-value phrase false
# positives, and KeywordTokenizer would emit one token for the whole
# joined list instead of one per value)
POSITION_INC_GAP = 100


def _list_value_stream(list_arr, settings: AnalyzerSettings,
                       gap: int = POSITION_INC_GAP) -> TokenStream:
    """Analyze a list<string> column PER VALUE and remap the stream to
    the parent document — the reference runs each value through its
    own TokenStream (Lucene Document.add per value), so filters like
    shingles see one value at a time, and value k's first token sits
    ``gap`` positions past value k-1's last (position arithmetic:
    base_k = base_{k-1} + emitted-span_{k-1} + gap). A value whose
    tokens are all dropped (e.g. stop-worded) still advances the base
    by ``gap``; trailing-dropped token counts are not recoverable from
    the emitted stream — a ±few-position deviation vs Lucene's
    counter, invisible next to the 100-position gap."""
    la = list_arr.combine_chunks() if isinstance(list_arr, pa.ChunkedArray) else list_arr
    flat = la.flatten()
    parent = pc.list_parent_indices(la).to_numpy(zero_copy_only=False).astype(np.int64)
    ts = tokenize(flat, settings)
    pos = None
    if ts.pos is not None and parent.size:
        # per-value emitted position span (max emitted pos + 1)
        spans = np.zeros(parent.size, dtype=np.int64)
        if len(ts):
            np.maximum.at(spans, ts.doc_idx, ts.pos + 1)
        # segmented cumulative base: values of a parent are contiguous
        gbase = np.concatenate(([0], np.cumsum(spans + gap)))[:-1]
        first = np.searchsorted(parent, parent, side="left")
        base = gbase - gbase[first]
        pos = ts.pos + base[ts.doc_idx]
    elif ts.pos is not None:
        pos = ts.pos
    return TokenStream(parent[ts.doc_idx], ts.codes, ts.vocab, pos)


def term_freqs_list(list_arr, settings: AnalyzerSettings):
    """:func:`term_freqs` for a multivalued column (per-value token
    streams, reference analysis semantics)."""
    return _agg_pairs(_list_value_stream(list_arr, settings), len(list_arr))


def term_freqs_positions_list(list_arr, settings: AnalyzerSettings):
    """:func:`term_freqs_positions` for a multivalued column
    (per-value token streams; 100-position gaps between values)."""
    return _agg_pairs_positions(_list_value_stream(list_arr, settings), len(list_arr))


def analyze_query_text(text: str, settings: AnalyzerSettings) -> list[str]:
    """Analyze a query string with the same chain (order preserved)."""
    _, terms = analyze_series(pd.Series([text]), settings)
    return [str(t) for t in terms]

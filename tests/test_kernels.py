"""Unit tests for the pure-NumPy kernels (no Spark)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zuliasearch_spark.analysis.analyzers import analyze_query_text, term_freqs
from zuliasearch_spark.config import DEFAULT_ANALYZERS
from zuliasearch_spark.util.hashing import djb2_hash, djb2_hash_series, find_shard_for_unique_id, shard_for_series
from zuliasearch_spark.util.smallfloat import byte4_to_int, int_to_byte4, quantize_length
from zuliasearch_spark.util.varint import (
    segmented_cumsum,
    varint_decode,
    varint_encode,
    varint_encode_with_offsets,
)


class TestSmallFloat:
    def test_exact_below_16(self):
        v = np.arange(16)
        assert (quantize_length(v) == v).all()

    def test_monotone_lower_bound(self):
        v = np.arange(0, 100_000)
        q = quantize_length(v)
        assert (q <= v).all()
        assert (np.diff(q) >= 0).all()

    def test_reference_values(self):
        # hand-computed from the Lucene SmallFloat algorithm
        cases = {0: 0, 1: 1, 15: 15, 16: 16, 17: 16, 39: 36, 40: 40, 100: 96, 255: 240, 1000: 960}
        for v, want in cases.items():
            assert int(quantize_length(np.array([v]))[0]) == want

    def test_byte_range(self):
        b = int_to_byte4(np.arange(0, 1_000_000, 997))
        assert b.dtype == np.uint8
        assert (byte4_to_int(b) >= 0).all()


class TestVarint:
    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, vals):
        arr = np.array(vals, dtype=np.int64)
        assert varint_decode(varint_encode(arr)).tolist() == vals

    def test_known_encoding(self):
        assert varint_encode(np.array([0, 1, 127, 128, 16384])) == b"\x00\x01\x7f\x80\x01\x80\x80\x01"

    def test_offsets_slicing(self):
        vals = np.array([5, 300, 1, 70000, 2])
        buf, offs = varint_encode_with_offsets(vals)
        for i in range(len(vals)):
            assert varint_decode(buf[offs[i] : offs[i + 1]])[0] == vals[i]

    def test_segmented_cumsum(self):
        # two blocks: [10, +2, +3] and [100, +1]
        v = np.array([10, 2, 3, 100, 1])
        out = segmented_cumsum(v, np.array([0, 3]))
        assert out.tolist() == [10, 12, 15, 100, 101]


class TestDjb2:
    def test_matches_scalar(self):
        s = pd.Series(["a", "", "org1/repo5:src/x.py:abc", "z" * 500, "héllo"])
        vec = djb2_hash_series(s)
        for i, x in enumerate(s):
            assert djb2_hash(x) == vec[i]

    def test_known_value(self):
        # djb2("a") = 5381*33 + ord('a') = 177670
        assert djb2_hash("a") == 177670
        assert find_shard_for_unique_id("a", 7) == 177670 % 7

    def test_shard_range(self):
        s = pd.Series([f"doc{i}" for i in range(1000)])
        shards = shard_for_series(s, 5)
        assert set(np.unique(shards)) <= set(range(5))


class TestAnalyzers:
    def test_code_split(self):
        assert analyze_query_text("parseQueryNode", DEFAULT_ANALYZERS["code_standard"]) == [
            "parse",
            "query",
            "node",
        ]
        assert analyze_query_text("shard_reader", DEFAULT_ANALYZERS["code_standard"]) == [
            "shard",
            "reader",
        ]
        assert analyze_query_text("HTTPServer2", DEFAULT_ANALYZERS["code_standard"]) == [
            "http",
            "server",
            "2",
        ]

    def test_standard_keeps_identifiers(self):
        out = analyze_query_text("def shard_reader(x): pass", DEFAULT_ANALYZERS["standard"])
        assert "shard_reader" in out  # underscore joins (UAX#29 ExtendNumLet)

    def test_stopwords_removed(self):
        assert analyze_query_text("the quick fox", DEFAULT_ANALYZERS["standard"]) == ["quick", "fox"]

    def test_keyword(self):
        assert analyze_query_text("Hello World", DEFAULT_ANALYZERS["lcKeyword"]) == ["hello world"]

    def test_term_freqs_and_dl(self):
        texts = pd.Series(["a b a", None, "", "B b"])
        d, t, tf, dl = term_freqs(texts, DEFAULT_ANALYZERS["whitespace_lc"])
        pairs = sorted(zip(d.tolist(), t.to_pylist(), tf.tolist()))
        assert pairs == [(0, "a", 2), (0, "b", 1), (3, "b", 2)]
        assert dl.tolist() == [3, 0, 0, 2]

    def test_unicode_preserved(self):
        out = analyze_query_text("héllo wörld", DEFAULT_ANALYZERS["standard"])
        assert out == ["héllo", "wörld"]

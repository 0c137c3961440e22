"""Multivalued analysis parity: each value runs its own analyzer
chain with a 100-position gap between values
(ZuliaFieldAnalyzer.getPositionIncrementGap = 100) — phrases,
proximity windows, and shingles never match ACROSS two values, and
KEYWORD-family analyzers emit one token per value.
"""

import pandas as pd
import pytest

from zuliasearch_spark.config import AnalyzerSettings, FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine


def _engine(spark, analyzer="whitespace_lc", analyzers=None):
    cfg = IndexConfig(
        index_name="mv",
        unique_id_col="uniqueId",
        number_of_shards=1,
        default_search_fields=("vals",),
        analyzers=analyzers or {},
        field_configs=(
            FieldConfig("vals", index_as=(IndexAs("vals", analyzer),)),
        ),
    )
    rows = [
        ("1", ["alpha beta", "gamma delta"]),   # boundary: beta|gamma
        ("2", ["alpha beta gamma delta"]),       # same words, one value
    ]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "vals"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    return SearchEngine(tables), tables


def test_phrase_never_crosses_value_boundary(spark):
    eng, t = _engine(spark)
    try:
        # within-value phrases match both docs
        assert eng.search_string('vals:"alpha beta"')["totalHits"] == 2
        assert eng.search_string('vals:"gamma delta"')["totalHits"] == 2
        # the boundary phrase exists only in the single-value doc
        assert eng.search_string('vals:"beta gamma"')["totalHits"] == 1
        # proximity: slop below the 100-gap cannot bridge values either
        assert eng.search_string('vals:"beta gamma"~10')["totalHits"] == 1
        assert eng.search_string('vals:"alpha delta"~50')["totalHits"] == 1
    finally:
        t.unpersist()


def test_terms_and_lengths_unchanged_by_gap(spark):
    eng, t = _engine(spark)
    try:
        # plain terms match regardless of which value carries them,
        # and BM25 field length is the total emitted token count
        for term in ("alpha", "beta", "gamma", "delta"):
            assert eng.search_string(f"vals:{term}")["totalHits"] == 2
    finally:
        t.unpersist()


def test_shingles_never_cross_values(spark):
    shingle = {
        "sh22": AnalyzerSettings("sh22", "STANDARD", ("LOWERCASE", "TWO_TWO_SHINGLE"))
    }
    eng, t = _engine(spark, analyzer="sh22", analyzers=shingle)
    try:
        # within-value bigram exists in both docs
        assert eng.search_string('vals:"alpha beta"')["totalHits"] == 2
        # the cross-boundary bigram "beta gamma" exists ONLY where the
        # words share a value
        assert eng.search_string('vals:"beta gamma"')["totalHits"] == 1
    finally:
        t.unpersist()


def test_keyword_emits_one_token_per_value(spark):
    eng, t = _engine(spark, analyzer="lcKeyword")
    try:
        # each VALUE is one keyword token (not the joined list)
        assert eng.search_string('vals:"alpha beta"')["totalHits"] == 1
        assert eng.search_string('vals:"alpha beta gamma delta"')["totalHits"] == 1
    finally:
        t.unpersist()

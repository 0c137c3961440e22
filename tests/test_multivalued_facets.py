"""Multivalued facet fields (FacetTest facets List-valued fields):
every facet surface counts per ELEMENT, with a value repeated inside
one doc counting once (Lucene SortedSetDocValues ordinal semantics)."""

from __future__ import annotations

import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause, SearchRequest

REQ = SearchRequest((QueryClause("FILTER", q="doc", qf=("body",)),))


@pytest.fixture(scope="module")
def eng(spark):
    rows = [
        # (uid, body, authors, score) — a2 repeats "ann" inside one doc
        ("a1", "doc one", ["ann", "bob"], 10),
        ("a2", "doc two", ["ann", "ann"], 20),
        ("a3", "doc three", ["bob"], 30),
        ("a4", "doc four", ["cid", "ann"], 40),
        ("a5", "doc five", [], 50),
        ("a6", "doc six", None, 60),
    ]
    df = spark.createDataFrame(
        rows, "uid string, body string, authors array<string>, score int"
    )
    cfg = IndexConfig(
        index_name="mv",
        unique_id_col="uid",
        number_of_shards=2,
        default_search_fields=("body",),
        field_configs=(
            FieldConfig("body", index_as=(IndexAs("body", "whitespace_lc"),)),
            FieldConfig("authors", facet_as=("authors",)),
        ),
    )
    return SearchEngine(build_index(df, cfg, stored_cols=("authors", "score")))


def test_multivalued_facet_counts(eng):
    got = {r["value"]: r["cnt"] for r in eng.facet_counts(REQ, "authors").collect()}
    # ann: a1, a2 (repeated inside the doc counts ONCE), a4
    assert got == {"ann": 3, "bob": 2, "cid": 1}


def test_multivalued_facet_counts_sharded(eng):
    df, flags = eng.facet_counts_sharded(REQ, "authors", top_n=10, shard_facets=-1)
    got = {r["value"]: r["cnt"] for r in df.collect()}
    assert got == {"ann": 3, "bob": 2, "cid": 1}


def test_multivalued_stat_facets(eng):
    rows = eng.stat_facets(REQ, "authors", "score").collect()
    got = {r["value"]: (r["sum_v"], r["all_doc_count"]) for r in rows}
    assert got == {"ann": (70, 3), "bob": (40, 2), "cid": (40, 1)}


def test_multivalued_stat_facet_percentiles(eng):
    rows = eng.stat_facet_percentiles(REQ, "authors", "score", percentiles=(0.5,)).collect()
    by = {r["value"]: r for r in rows}
    assert set(by) == {"ann", "bob", "cid"}
    # ann's values {10, 20, 40}: median within DDSketch relative error
    assert by["ann"]["p50"] == pytest.approx(20.0, rel=0.05)

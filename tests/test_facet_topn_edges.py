"""Facet topN edge cases (FacetTopNEdgeCaseTest.java).

The reference switches between a priority queue and collect-and-sort
at topN >= cardinality/2 (AggregationHandler.shouldCollectAndSort)
and asserts both paths agree; here every topN is a prefix of the same
exact groupBy, so the invariants it checks are: size = min(topN,
cardinality), counts descending, any topN is a count-equal subset of
the baseline, topN=-1 returns ALL labels, ties break identically at
every topN, no-match queries yield empty facets, and hierarchical
sub-paths honor topN per level.
"""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

UNIQUE = 10
DOCS_PER = 20
REQ = SearchRequest((C("FILTER", q="title:document"),), amount=1)


def _cfg(name: str, shards: int, keyword_field: str = "category") -> IndexConfig:
    return IndexConfig(
        index_name=name,
        unique_id_col="uniqueId",
        number_of_shards=shards,
        default_search_fields=("title",),
        field_configs=(
            FieldConfig("title", index_as=(IndexAs("title", "standard"),)),
            FieldConfig(keyword_field, index_as=(IndexAs(keyword_field, "lcKeyword"),)),
        ),
    )


def _edge_rows():
    # category_0 gets 29 docs ... category_9 gets 20 (distinct counts)
    rows = []
    for cat in range(UNIQUE):
        for j in range(DOCS_PER + (UNIQUE - 1 - cat)):
            rows.append(
                (f"cat{cat}_doc{j}", f"Document cat{cat}_doc{j}", f"category_{cat}",
                 (cat + 1) * 10 + j)
            )
    return rows


def _engine(spark, name, shards, rows):
    pdf = pd.DataFrame(rows, columns=["uniqueId", "title", "category", "value"])
    tables = build_index(
        spark.createDataFrame(pdf), _cfg(name, shards), stored_cols=("category", "value")
    ).persist()
    return SearchEngine(tables), tables


@pytest.fixture(scope="module")
def single(spark):
    eng, t = _engine(spark, "facetEdgeSingle", 1, _edge_rows())
    yield eng
    t.unpersist()


@pytest.fixture(scope="module")
def multi(spark):
    eng, t = _engine(spark, "facetEdgeMulti", 3, _edge_rows())
    yield eng
    t.unpersist()


def test_count_facet_topn_boundary(single):
    baseline = [(r["value"], r["cnt"]) for r in single.facet_counts(REQ, "category", top_n=-1).collect()]
    assert len(baseline) == UNIQUE
    assert [c for _, c in baseline] == sorted((c for _, c in baseline), reverse=True)
    by_label = dict(baseline)
    for top_n in (1, 4, 5, 9, 10, 11):
        got = [(r["value"], r["cnt"]) for r in single.facet_counts(REQ, "category", top_n=top_n).collect()]
        assert len(got) == min(top_n, UNIQUE), top_n
        # prefix of the baseline order, counts equal
        assert got == baseline[: len(got)], top_n
        assert all(by_label[v] == c for v, c in got)
    # topN=0 takes the reference default of 10
    assert len(single.facet_counts(REQ, "category", top_n=0).collect()) == 10


def test_stat_facet_topn_boundary(single):
    baseline = [
        (r["value"], r["doc_count"], r["sum_v"])
        for r in single.stat_facets(REQ, "category", "value", top_n=-1).collect()
    ]
    assert len(baseline) == UNIQUE
    for top_n in (1, 4, 5, 9, 10, 11):
        got = [
            (r["value"], r["doc_count"], r["sum_v"])
            for r in single.stat_facets(REQ, "category", "value", top_n=top_n).collect()
        ]
        assert len(got) == min(top_n, UNIQUE), top_n
        assert got == baseline[: len(got)], top_n


def test_multi_shard_all_shard_facets(single, multi):
    # shardFacets=-1: full per-shard lists merge exactly — equal to the
    # single-shard exact counts at every topN boundary
    baseline = [(r["value"], r["cnt"]) for r in single.facet_counts(REQ, "category", top_n=-1).collect()]
    for top_n in (4, 5, 9, 10, 11):
        df, flags = multi.facet_counts_sharded(REQ, "category", top_n=top_n, shard_facets=-1)
        got = [(r["value"], r["cnt"]) for r in df.collect()]
        assert len(got) == min(top_n, UNIQUE)
        assert got == baseline[: len(got)]
        assert flags == {"possibleMissing": False, "maxValuePossibleMissing": 0}


def test_tied_counts_tiebreaker(spark):
    # equal doc counts per category: the label-ascending tiebreak must
    # produce the same prefix at every topN
    rows = []
    for cat in range(UNIQUE):
        for j in range(DOCS_PER):
            rows.append(
                (f"tied_cat{cat}_doc{j}", f"Document {cat}_{j}", f"category_{cat}",
                 (cat + 1) * 100 + j)
            )
    eng, t = _engine(spark, "facetEdgeTied", 1, rows)
    try:
        allc = [(r["value"], r["cnt"]) for r in eng.facet_counts(REQ, "category", top_n=-1).collect()]
        assert all(c == DOCS_PER for _, c in allc)
        four = [r["value"] for r in eng.facet_counts(REQ, "category", top_n=4).collect()]
        five = [r["value"] for r in eng.facet_counts(REQ, "category", top_n=5).collect()]
        assert four == five[:4] == [v for v, _ in allc[:4]]
    finally:
        t.unpersist()


def test_no_match_query_empty_facets(single):
    req = SearchRequest((C("FILTER", q="category:nonexistent_value_xyz"),), amount=1)
    for top_n in (4, 5, 10, -1):
        assert single.facet_counts(req, "category", top_n=top_n).collect() == []
        assert single.stat_facets(req, "category", "value", top_n=top_n).collect() == []
        assert (
            single.stat_facet_percentiles(req, "category", "value", top_n=top_n).collect()
            == []
        )


def test_hierarchical_subpath_topn(spark):
    # "a" has 3 children, "b" has 2, "c" none — per-level cardinality
    groups = {"a/x": 15, "a/y": 15, "a/z": 15, "b/p": 15, "b/q": 15, "c": 15}
    rows = []
    i = 0
    for path, n in groups.items():
        for _ in range(n):
            rows.append((f"hier_{i}", f"Hierarchical hier_{i}", path, i))
            i += 1
    pdf = pd.DataFrame(rows, columns=["uniqueId", "title", "path", "value"])
    tables = build_index(
        spark.createDataFrame(pdf),
        _cfg("facetEdgeHier", 1, keyword_field="path"),
        stored_cols=("path", "value"),
    ).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("FILTER", q="title:hierarchical"),), amount=1)
        top = eng.facet_path_counts(req, "path", (), top_n=-1).collect()
        assert {r["value"] for r in top} == {"a", "b", "c"}
        for top_n in (1, 2, 3, 5):
            got = eng.facet_path_counts(req, "path", (), top_n=top_n).collect()
            assert len(got) == min(top_n, 3), top_n
        a_children = eng.facet_path_counts(req, "path", ("a",), top_n=-1).collect()
        assert {r["value"] for r in a_children} == {"x", "y", "z"}
        for top_n in (1, 2, 3, 5):
            got = eng.facet_path_counts(req, "path", ("a",), top_n=top_n).collect()
            assert len(got) == min(top_n, 3), top_n
        b_children = eng.facet_path_counts(req, "path", ("b",), top_n=-1).collect()
        assert {r["value"] for r in b_children} == {"p", "q"}
        for top_n in (1, 2, 3):
            got = eng.facet_path_counts(req, "path", ("b",), top_n=top_n).collect()
            assert len(got) == min(top_n, 2), top_n
    finally:
        tables.unpersist()

"""Full DrillDown surface: multi-value OR/AND, minimum-should-match,
exclude, and the all-negative fix-up — ZuliaIndex.getQuery:726-758
(each DrillDown group is FILTER or MUST_NOT; values inside a group
are SHOULD with setMinimumNumberShouldMatch(mm) under OR, MUST under
AND; the drill-down term is FacetLabel(value, *path) under the
dimension label, zulia_query.proto DrillDown:104-110)."""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import DrillDown, QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

MATCH_ALL = SearchRequest((C("FILTER", q="content:doc"),), amount=100)

# (uid, source_path, region_path) — 8 docs; doc7 has NO facet value
DOCS = [
    ("u0", "src1/en", "us/west"),
    ("u1", "src1/fr", "us/east"),
    ("u2", "src2/en", "eu/west"),
    ("u3", "src2/fr", "eu/east"),
    ("u4", "src3/en", "us/west"),
    ("u5", "src3/fr", "eu/west"),
    ("u6", "src1/en", "us/west"),
    ("u7", None, None),
]


@pytest.fixture(scope="module")
def engine(spark):
    rows = [(uid, "doc body", src, reg) for uid, src, reg in DOCS]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "src_path", "region"])
    cfg = IndexConfig(
        index_name="drilldown",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    tables = build_index(
        spark.createDataFrame(pdf), cfg, stored_cols=("src_path", "region")
    ).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def _hits(engine, drilldowns):
    pred = engine.drill_downs_predicate(drilldowns)
    return engine.search_docvalues(MATCH_ALL, pred, amount=100)["totalHits"]


def _uids(engine, drilldowns):
    pred = engine.drill_downs_predicate(drilldowns)
    res = engine.search_docvalues(MATCH_ALL, pred, amount=100)
    return sorted(t["uniqueId"] for t in res["topk"])


def test_or_multi_value(engine):
    # source in {src1, src3}: u0, u1, u4, u5, u6
    dd = DrillDown("src_path", (("src1",), ("src3",)))
    assert _uids(engine, [dd]) == ["u0", "u1", "u4", "u5", "u6"]


def test_or_with_nested_path(engine):
    # (src1, en) exact component prefix: u0, u6
    dd = DrillDown("src_path", (("src1", "en"),))
    assert _uids(engine, [dd]) == ["u0", "u6"]


def test_and_operator_across_dimensions_needs_two_groups(engine):
    # one AND group over a single dimension: src1 AND src2 -> nothing
    dd = DrillDown("src_path", (("src1",), ("src2",)), operator="AND")
    assert _hits(engine, [dd]) == 0
    # two FILTER groups on different dimensions: src ∈ {src1} AND
    # region ∈ {us/west} -> u0, u6
    dds = [
        DrillDown("src_path", (("src1",),)),
        DrillDown("region", (("us", "west"),)),
    ]
    assert _uids(engine, dds) == ["u0", "u6"]


def test_min_should_match(engine):
    # OR over {src1, us-region} with mm=2: doc must match BOTH
    # (possible because both predicates live on one doc via two
    # groups normally — here mm applies within ONE group, so use two
    # values on the same dimension that can't co-occur -> mm=2 empty)
    dd = DrillDown("src_path", (("src1",), ("src2",)), mm=2)
    assert _hits(engine, [dd]) == 0
    # mm greater than the number of SHOULD clauses matches nothing
    # (Lucene BooleanQuery rewrite)
    dd = DrillDown("src_path", (("src1",),), mm=5)
    assert _hits(engine, [dd]) == 0
    # mm=0 behaves like mm=1 on a pure-SHOULD group
    dd0 = DrillDown("src_path", (("src1",), ("src2",)), mm=0)
    dd1 = DrillDown("src_path", (("src1",), ("src2",)), mm=1)
    assert _uids(engine, [dd0]) == _uids(engine, [dd1]) == [
        "u0", "u1", "u2", "u3", "u6",
    ]


def test_exclude_is_must_not(engine):
    # positive src∈{src1,src2} minus exclude (src2, fr): drops u3
    dds = [
        DrillDown("src_path", (("src1",), ("src2",))),
        DrillDown("src_path", (("src2", "fr"),), exclude=True),
    ]
    assert _uids(engine, dds) == ["u0", "u1", "u2", "u6"]


def test_all_negative_gets_implicit_match_all(engine):
    # only excludes: everything except src1 docs — including u7,
    # which has NO facet value (MUST_NOT only rejects docs that HAVE
    # the term; ZuliaIndex.java:754-756 adds MatchAll FILTER)
    dds = [DrillDown("src_path", (("src1",),), exclude=True)]
    assert _uids(engine, dds) == ["u2", "u3", "u4", "u5", "u7"]


def test_and_with_mm_matches_nothing(engine):
    # reference passes mm through even under AND; Lucene: minShould >
    # #optional (0) -> MatchNoDocs
    dd = DrillDown("src_path", (("src1",),), operator="AND", mm=1)
    assert _hits(engine, [dd]) == 0


def test_empty_drilldown_list_is_match_all(engine):
    assert _hits(engine, []) == 8

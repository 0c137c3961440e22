"""DATE field queries — DateStringTest.java semantics: point queries
coerce to the period (year/month/day), ranges honor partial-precision
bounds, sorts order chronologically with missing placement, facets
format to yyyy-MM-dd labels."""

import datetime as dt

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

# mirrors DateStringTest's corpus: timestamps, plain dates, year-only
# and year-month inputs (coerced at ingestion to period starts), one
# control date, blanks
DOCS = [
    ("0", "alpha", dt.datetime(2024, 6, 17, 16, 10, 0)),
    ("1", "alpha", dt.datetime(2024, 6, 17, 0, 0, 0)),
    ("2", "alpha", dt.datetime(2024, 6, 18, 0, 0, 0)),
    ("3", "alpha", dt.datetime(2022, 1, 1, 0, 0, 0)),
    ("4", "alpha", dt.datetime(2022, 3, 1, 0, 0, 0)),
    ("5", "alpha", dt.datetime(2025, 12, 25, 0, 0, 0)),
    ("6", "alpha", None),
    ("7", "alpha", dt.datetime(2023, 7, 4, 12, 0, 0)),
    ("8", "alpha", dt.datetime(2024, 3, 15, 0, 0, 0)),
]


@pytest.fixture(scope="module")
def date_eng(spark):
    cfg = IndexConfig(
        index_name="dates",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(DOCS, columns=["uniqueId", "content", "added"])
    sdf = spark.createDataFrame(pdf, "uniqueId string, content string, added timestamp")
    tables = build_index(sdf, cfg, stored_cols=("added",)).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def _hits(eng, qs):
    return eng.search_string(qs, amount=100)["totalHits"]


def test_date_point_queries(date_eng):
    # exact-day point query matches both 2024-06-17 docs
    assert _hits(date_eng, "content:alpha AND added:2024-06-17") == 2
    # year point query matches the whole year (4 docs in 2024)
    assert _hits(date_eng, "content:alpha AND added:2024") == 4
    # month precision
    assert _hits(date_eng, "content:alpha AND added:2024-06") == 3
    # (the reference's slash-separated case is an INGESTION input
    # format — query-side '/' is the regex delimiter in the grammar)


def test_quoted_timestamp_point_query(date_eng):
    # QueryParserTest.quotedTimestampQueryTest: a bare timestamp point
    # query fails (':' reads as a field separator) ...
    from zuliasearch_spark.search.parser import ParseError

    with pytest.raises(ParseError):
        date_eng.search_string("added:2024-06-17T16:10:00Z")
    # ... quoting is the escape and equals the single-instant range
    quoted = _hits(date_eng, 'added:"2024-06-17T16:10:00Z"')
    rng = _hits(date_eng, "added:[2024-06-17T16:10:00Z TO 2024-06-17T16:10:00Z]")
    assert quoted == rng == 1
    # backslash-escaping the colons is the other escape
    assert _hits(date_eng, r"added:2024-06-17T16\:10\:00Z") == 1
    # quoting also accepts an offset-less timestamp (assumed UTC)
    assert _hits(date_eng, 'added:"2024-06-17T16:10:00"') == 1


def test_offsetless_timestamp_range_is_utc(date_eng):
    # QueryParserTest.offsetlessTimestampQueryTest: offset-less bounds
    # equal the explicit-Z form
    offsetless = _hits(date_eng, "added:[2024-06-17T16:10:00 TO 2024-06-18T08:00:00]")
    explicit = _hits(date_eng, "added:[2024-06-17T16:10:00Z TO 2024-06-18T08:00:00Z]")
    assert offsetless == explicit == 2
    # a different instant bounds a different range (not two empty parses)
    assert _hits(date_eng, "added:[2024-06-17T16:11:00Z TO 2024-06-18T08:00:00Z]") == 1


def test_date_range_partial_precision(date_eng):
    # DateStringTest: [2022-02-01 TO 2024-06-17T23:59:59Z] → 5 docs
    assert _hits(date_eng, "content:alpha AND added:[2022-02-01 TO 2024-06-17T23:59:59Z]") == 5
    # year-to-year inclusive covers both full years
    assert _hits(date_eng, "content:alpha AND added:[2022 TO 2023]") == 3
    # exclusive upper bound excludes the period start
    assert _hits(date_eng, "content:alpha AND added:{2022 TO 2024}") == 1  # only 2023-07-04
    assert _hits(date_eng, "content:alpha AND added>=2025") == 1


def test_date_sort_and_missing(date_eng):
    req = SearchRequest((C("FILTER", q="content:alpha"),), amount=20)
    asc = date_eng.sort_search(req, sort_col="added", ascending=True, amount=20).collect()
    assert asc[0]["uniqueId"] == "3"  # 2022-01-01 earliest
    assert asc[-1]["uniqueId"] == "6"  # missing last
    desc = date_eng.sort_search(
        req, sort_col="added", ascending=False, missing_last=False, amount=20
    ).collect()
    assert desc[0]["uniqueId"] == "6"  # missing first
    assert desc[1]["uniqueId"] == "5"  # 2025-12-25 latest


def test_date_facet_labels(date_eng):
    req = SearchRequest((C("FILTER", q="content:alpha"),), amount=1)
    rows = date_eng.facet_counts(req, "added", top_n=20, date_format="yyyy-MM-dd").collect()
    counts = {r["value"]: r["cnt"] for r in rows if r["value"] is not None}
    assert counts["2024-06-17"] == 2
    assert counts["2024-06-18"] == 1
    assert counts["2022-01-01"] == 1
    assert counts["2025-12-25"] == 1


def test_numeric_point_query_coercion(spark):
    """NumericFacetConversionTest semantics: a bare term on a stored
    (non-indexed) numeric column is an exact point-range query, and
    numeric facets count by value."""
    rows = [
        ("n0", "x", 2020, 10000000000),
        ("n1", "x", 2020, 10000000000),
        ("n2", "x", 2021, 20000000000),
    ]
    cfg = IndexConfig(
        index_name="numpoint",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "year", "bigNum"])
    sdf = spark.createDataFrame(
        pdf, "uniqueId string, content string, year int, bigNum bigint"
    )
    tables = build_index(sdf, cfg, stored_cols=("year", "bigNum")).persist()
    try:
        eng = SearchEngine(tables)
        assert eng.search_string("content:x AND year:2020", amount=10)["totalHits"] == 2
        assert (
            eng.search_string("content:x AND bigNum:20000000000", amount=10)["totalHits"]
            == 1
        )
        req = SearchRequest((C("FILTER", q="content:x"),), amount=1)
        counts = {
            r["value"]: r["cnt"] for r in eng.facet_counts(req, "year", top_n=10).collect()
        }
        assert counts == {2020: 2, 2021: 1}
    finally:
        tables.unpersist()

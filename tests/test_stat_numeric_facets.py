"""Stat facets with missing values + integral facet coercion.

Mirrors StatFacetNoValueTest.java (facet labels whose docs carry no
numeric value; empty-shard sketch merge) and
NumericFacetConversionTest.java (Double-encoded integral values
collapse into one integral facet bucket that round-trips to a
numeric-set query).
"""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index, int_coerce
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


def _cfg(name: str, shards: int) -> IndexConfig:
    return IndexConfig(
        index_name=name,
        unique_id_col="uniqueId",
        number_of_shards=shards,
        default_search_fields=("title",),
        field_configs=(
            FieldConfig("title", index_as=(IndexAs("title", "standard"),)),
        ),
    )


@pytest.fixture(scope="module")
def price_engine(spark):
    # StatFacetNoValueTest.java:66-95: 3 docs with price + hasPrice
    # facet, 3 docs with the noPrice facet and NO price value; 10
    # shards so most shards hold zero matching docs (the empty-shard
    # sketch-merge scenario of the reference's gamma=0 crash)
    rows = [(f"hasPrice-{i}", "item with price", "hasPrice", 10.0 + i) for i in range(3)]
    rows += [(f"noPrice-{i}", "item without price", "noPrice", None) for i in range(3)]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "title", "category", "price"])
    tables = build_index(
        spark.createDataFrame(pdf), _cfg("statNoValue", 10), stored_cols=("category", "price")
    ).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def test_numeric_stat_with_empty_shards(price_engine):
    # StatFacetNoValueTest order(3): title:price matches only the 3
    # priced docs; 7 of 10 shards contribute nothing and must not
    # poison the merge
    req = SearchRequest((C("FILTER", q="title:price"),), amount=1)
    row = price_engine.numeric_stats(req, "price").collect()[0]
    assert row["doc_count"] == 3
    assert row["count_v"] == 3
    assert abs(row["min_v"] - 10.0) < 0.01
    assert abs(row["max_v"] - 12.0) < 0.01
    # global sketch percentiles over the same sparse match set
    pct = price_engine.percentile_sketch_stats(req, "price", (0.0, 0.5, 1.0)).collect()[0]
    assert abs(pct["p0"] - 10.0) <= 0.2 and abs(pct["p100"] - 12.0) <= 0.3


def test_stat_facet_with_no_value_labels(price_engine):
    # StatFacetNoValueTest order(4): noPrice has docs but no values
    req = SearchRequest((C("FILTER", q="title:item"),), amount=1)
    by = {r["value"]: r for r in price_engine.stat_facets(req, "category", "price").collect()}
    assert set(by) == {"hasPrice", "noPrice"}
    has = by["hasPrice"]
    assert has["doc_count"] == 3 and has["count_v"] == 3 and has["all_doc_count"] == 3
    assert has["min_v"] >= 10.0 and has["max_v"] <= 12.0
    no = by["noPrice"]
    assert no["doc_count"] == 0 and no["count_v"] == 0
    assert no["all_doc_count"] == 3
    assert no["min_v"] is None and no["sum_v"] is None
    # valued labels rank before null-sum labels (nulls-last)
    ordered = [r["value"] for r in price_engine.stat_facets(req, "category", "price").collect()]
    assert ordered == ["hasPrice", "noPrice"]


def test_stat_facet_percentiles_no_value_labels(price_engine):
    req = SearchRequest((C("FILTER", q="title:item"),), amount=1)
    df = price_engine.stat_facet_percentiles(req, "category", "price", percentiles=(0.5,))
    by = {r["value"]: r for r in df.collect()}
    assert set(by) == {"hasPrice", "noPrice"}
    assert by["hasPrice"]["count_v"] == 3 and by["hasPrice"]["all_doc_count"] == 3
    assert abs(by["hasPrice"]["p50"] - 11.0) <= 0.25
    # no percentiles for the label with no values — NULL, not a crash
    assert by["noPrice"]["count_v"] == 0
    assert by["noPrice"]["all_doc_count"] == 3
    assert by["noPrice"]["p50"] is None


@pytest.fixture(scope="module")
def year_engine(spark):
    # NumericFacetConversionTest.java:55-62: a Double encoding of an
    # integral value plus a matching Integer/Long must collapse into
    # one facet bucket with an integral label
    rows = [
        ("1", "record one", 2020.0, 10_000_000_000.0),
        ("2", "record two", 2020, 10_000_000_000),
        ("3", "record three", 2021.0, 20_000_000_000.0),
    ]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "title", "year_raw", "big_raw"])
    corpus = (
        spark.createDataFrame(pdf)
        .withColumn("year", int_coerce("year_raw", bits=32))
        .withColumn("bigNum", int_coerce("big_raw", bits=64))
    )
    tables = build_index(corpus, _cfg("numCoerce", 1), stored_cols=("year", "bigNum")).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def test_facet_labels_are_integral(year_engine):
    req = SearchRequest((C("FILTER", q="title:record"),), amount=1)
    years = {str(r["value"]): r["cnt"] for r in year_engine.facet_counts(req, "year").collect()}
    assert years == {"2020": 2, "2021": 1}
    assert not any("." in v for v in years)
    bigs = {str(r["value"]): r["cnt"] for r in year_engine.facet_counts(req, "bigNum").collect()}
    assert bigs == {"10000000000": 2, "20000000000": 1}
    assert not any("." in v for v in bigs)


def test_facet_label_round_trips_to_numeric_query(year_engine):
    # NumericFacetConversionTest order(4): the facet label matches the
    # value as indexed, so a numeric-set query on it finds the bucket
    req = SearchRequest((C("FILTER", q="title:record"),), amount=1)
    assert year_engine.search_numeric_set(req, "year", (2020,), amount=1)["totalHits"] == 2
    assert (
        year_engine.search_numeric_set(req, "bigNum", (10_000_000_000,), amount=1)["totalHits"]
        == 2
    )


def test_int_coerce_truncates_numbers_and_rejects_bad_strings(spark):
    # Number path: Java Number.intValue() truncation toward zero
    pdf = pd.DataFrame({"v": [2020.7, -3.9, None]})
    got = [
        r["i"]
        for r in spark.createDataFrame(pdf).select(int_coerce("v").alias("i")).collect()
    ]
    assert got == [2020, -3, None]
    # String path: Integer.parseInt semantics — "2020.0" FAILS
    ok = spark.createDataFrame(pd.DataFrame({"s": ["2020", " 7 ", None]})).select(
        int_coerce("s", string_input=True).alias("i")
    )
    assert [r["i"] for r in ok.collect()] == [2020, 7, None]
    bad = spark.createDataFrame(pd.DataFrame({"s": ["2020.0"]})).select(
        int_coerce("s", string_input=True).alias("i")
    )
    with pytest.raises(Exception, match="cannot be parsed"):
        bad.collect()
    with pytest.raises(ValueError, match="bits"):
        int_coerce("s", bits=16)

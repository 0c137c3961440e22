"""Index-settings REPLACE with field-type changes + cross-segment
replace-by-uniqueId (FieldChangeTest.java; ZuliaShard.java:337-352
updateDocument = delete-then-add).

Two mechanisms under test:

- ``segments.commit_batch_segment``: a stored batch becomes one
  committed segment; uids already present in earlier segments are
  recorded as superseded and masked at read (optimize purges them) —
  Lucene's updateDocument across segments.
- ``segments._reconcile_types``: segments built under different index
  settings (createIndex REPLACE changing field1 string→int, field2
  int→string, field3 string→bool) still union into one readable
  doc_map — newest segment's type wins, old-typed values try_cast
  (null = missing) — so sorts/facets over the new types answer
  exactly like the reference's test.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import bool_coerce
from zuliasearch_spark.indexing.segments import (
    commit_batch_segment,
    optimize,
    read_segmented_index,
    read_superseded,
)
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

STORED = ("field1", "field2", "field3")


def _cfg_a() -> IndexConfig:
    """Original settings (FieldChangeTest order-1 createIndex):
    field1 string STANDARD, field2 int, field3 string STANDARD."""
    return IndexConfig(
        index_name="fieldChange",
        unique_id_col="id",
        number_of_shards=1,
        default_search_fields=("field1",),
        field_configs=(
            FieldConfig("id", index_as=(IndexAs("id", "lcKeyword"),), sort_as=("id",)),
            FieldConfig(
                "field1",
                index_as=(IndexAs("field1", "standard"),),
                sort_as=("field1",),
                facet_as=("field1",),
            ),
            FieldConfig("field2", sort_as=("field2",), facet_as=("field2",)),
            FieldConfig(
                "field3",
                index_as=(IndexAs("field3", "standard"),),
                sort_as=("field3",),
                facet_as=("field3",),
            ),
        ),
    )


def _cfg_b() -> IndexConfig:
    """Replacement settings (order-1 second createIndex): field1 int,
    field2 string STANDARD, field3 bool."""
    return IndexConfig(
        index_name="fieldChange",
        unique_id_col="id",
        number_of_shards=1,
        default_search_fields=("field2",),
        field_configs=(
            FieldConfig("id", index_as=(IndexAs("id", "lcKeyword"),), sort_as=("id",)),
            FieldConfig("field1", sort_as=("field1",), facet_as=("field1",)),
            FieldConfig(
                "field2",
                index_as=(IndexAs("field2", "standard"),),
                sort_as=("field2",),
                facet_as=("field2",),
            ),
            FieldConfig("field3", sort_as=("field3",), facet_as=("field3",)),
        ),
    )


@pytest.fixture(scope="module")
def changed_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fieldchange"))

    batch1 = spark.createDataFrame(
        pd.DataFrame(
            [("1", "someValue", 123, "hello")],
            columns=["id", "field1", "field2", "field3"],
        )
    )
    assert commit_batch_segment(batch1, 0, path, _cfg_a(), stored_cols=STORED)

    # settings REPLACE: same index path, new field types; doc 1
    # re-stored under the new types + two new docs ("yes" exercises
    # the lenient BOOL store lexicon, BooleanFormatTest)
    raw2 = spark.createDataFrame(
        pd.DataFrame(
            [
                ("1", 4343, "important value", "true"),
                ("2", 555, "some value", "false"),
                ("3", 4, "abcd", "yes"),
            ],
            columns=["id", "field1", "field2", "field3_raw"],
        )
    )
    batch2 = raw2.withColumn("field3", bool_coerce("field3_raw")).drop("field3_raw")
    assert commit_batch_segment(batch2, 1, path, _cfg_b(), stored_cols=STORED)
    return path


def test_replace_records_superseded(changed_index):
    assert read_superseded(changed_index) == [{"uid": "1", "below": 1}]


def test_sorts_after_field_change(spark, changed_index):
    """FieldChangeTest.sortTestAfterFieldChange, verbatim expectations:
    field1 asc → 4, desc → 4343; field2 asc → "abcd",
    desc → "some value"."""
    tables = read_segmented_index(spark, changed_index, _cfg_b()).persist()
    try:
        eng = SearchEngine(tables)
        match_all = SearchRequest(qs="*:*", amount=10)

        def first(col, asc):
            return eng.sort_search(
                match_all, sort_col=col, ascending=asc, amount=10
            ).collect()[0][col]

        assert first("field1", True) == 4
        assert first("field1", False) == 4343
        assert first("field2", True) == "abcd"
        assert first("field2", False) == "some value"
        # the superseded old-typed copy of doc 1 is dead: 3 live docs
        assert sum(eng.get_number_of_docs().values()) == 3
    finally:
        tables.unpersist()


def test_old_typed_values_coerce_or_null(spark, changed_index):
    tables = read_segmented_index(spark, changed_index, _cfg_b()).persist()
    try:
        eng = SearchEngine(tables)
        # bool facet sees the NEW-typed values only (True:2 / False:1);
        # the old string "hello" try_casts to null = unfaceted
        counts = {
            r["value"]: r["cnt"]
            for r in eng.facet_counts(
                SearchRequest(qs="*:*", amount=1), "field3"
            ).collect()
        }
        assert counts == {"True": 2, "False": 1}
        # the replaced doc is ONE doc: id:1 (indexed under both
        # settings) hits only the new-typed copy; the old segment-0
        # copy is superseded-masked
        res = eng.search_string("id:1", amount=10)
        assert res["totalHits"] == 1
        fetched = eng.fetch(["1"]).collect()
        assert len(fetched) == 1 and fetched[0]["field1"] == 4343
    finally:
        tables.unpersist()


def test_optimize_purges_superseded(spark, changed_index, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fieldchange_opt"))
    tables = optimize(spark, changed_index, out, _cfg_b()).persist()
    try:
        assert read_superseded(out) == []
        eng = SearchEngine(tables)
        assert sum(eng.get_number_of_docs().values()) == 3
        top = eng.sort_search(
            SearchRequest(qs="*:*", amount=10),
            sort_col="field1",
            ascending=False,
            amount=10,
        ).collect()
        assert [r["field1"] for r in top] == [4343, 555, 4]
    finally:
        tables.unpersist()


def test_same_config_restore_replaces_content(spark, tmp_path_factory):
    """Re-storing a uid in a later segment replaces it: the old
    content stops matching, the new content matches, counts stay
    exact (Store replace semantics over the segmented index)."""
    cfg = IndexConfig(
        index_name="restore",
        unique_id_col="id",
        number_of_shards=2,
        default_search_fields=("body",),
        field_configs=(
            FieldConfig("body", index_as=(IndexAs("body", "standard"),)),
        ),
    )
    path = str(tmp_path_factory.mktemp("restore_idx"))
    b1 = spark.createDataFrame(
        pd.DataFrame(
            [("x", "alpha common"), ("y", "gamma common")], columns=["id", "body"]
        )
    )
    b2 = spark.createDataFrame(
        pd.DataFrame([("x", "beta common")], columns=["id", "body"])
    )
    assert commit_batch_segment(b1, 0, path, cfg, stored_cols=("body",))
    assert commit_batch_segment(b2, 1, path, cfg, stored_cols=("body",))
    # idempotent replay commits nothing
    assert not commit_batch_segment(b2, 1, path, cfg, stored_cols=("body",))

    tables = read_segmented_index(spark, path, cfg).persist()
    try:
        eng = SearchEngine(tables)
        assert sum(eng.get_number_of_docs().values()) == 2
        assert eng.search_string("body:alpha", amount=10)["totalHits"] == 0
        beta = eng.search_string("body:beta", amount=10)
        assert beta["totalHits"] == 1
        assert beta["topk"][0]["uniqueId"] == "x"
        # the kernel path (scored common-term search) masks it too
        common = eng.search_string("body:common", amount=10)
        assert common["totalHits"] == 2
        assert {t["uniqueId"] for t in common["topk"]} == {"x", "y"}
    finally:
        tables.unpersist()

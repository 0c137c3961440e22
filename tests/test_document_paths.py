"""DocumentHelper dot-path access (zulia-util DocumentHelper.java)
as Catalyst expressions — mapper.document_path_col /
flatten_document_columns — including the end-to-end shape: nested
corpus → flatten → index → query with the reference's dotted field
names.
"""

import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.mapper import document_path_col, flatten_document_columns
from zuliasearch_spark.search.executor import SearchEngine


@pytest.fixture(scope="module")
def nested_df(spark):
    schema = (
        "uid string, "
        "address struct<city: string, geo: struct<lat: double, lon: double>>, "
        "authors array<struct<name: string, tags: array<string>>>, "
        "title string"
    )
    rows = [
        ("1", ("paris", (48.85, 2.35)), [("ada", ["x", "y"]), ("bob", ["z"])], "doc one"),
        ("2", ("tokyo", (35.68, 139.69)), [("carol", [])], "doc two"),
        ("3", (None, None), [(None, None), ("dan", ["w", ""])], "doc three"),
        ("4", None, None, "doc four"),
    ]
    return spark.createDataFrame(rows, schema)


def _vals(df, col):
    return [r[0] for r in df.select(col.alias("v")).orderBy("uid").collect()]


def test_struct_descent(nested_df):
    got = _vals(nested_df, document_path_col(nested_df, "address.city"))
    assert got == ["paris", "tokyo", None, None]
    lat = _vals(nested_df, document_path_col(nested_df, "address.geo.lat"))
    assert lat == [48.85, 35.68, None, None]


def test_array_of_structs_yields_value_list(nested_df):
    # getChild over a List: the child values of every item
    got = _vals(nested_df, document_path_col(nested_df, "authors.name"))
    assert got[0] == ["ada", "bob"]
    assert got[1] == ["carol"]
    # null items dropped (retainNullAndEmpty=false default)
    assert got[2] == ["dan"]
    assert got[3] is None


def test_nested_list_levels_flatten(nested_df):
    # authors.tags crosses array<struct> then array<string>: one list,
    # empty strings dropped by the default filter
    got = _vals(nested_df, document_path_col(nested_df, "authors.tags"))
    assert got[0] == ["x", "y", "z"]
    # carol's empty tag list survives as... all-empty -> NULL
    assert got[1] is None
    assert got[2] == ["w"]  # null item + empty string dropped


def test_retain_null_and_empty(nested_df):
    # retain mode keeps empty strings at the leaf (null SUBLISTS are
    # still dropped — Spark arrays are homogeneous and flatten()
    # would null the whole result; documented deviation)
    got = _vals(
        nested_df, document_path_col(nested_df, "authors.tags", retain_null_and_empty=True)
    )
    assert got[0] == ["x", "y", "z"]
    assert got[1] == []
    assert got[2] == ["w", ""]


def test_missing_field_raises(nested_df):
    with pytest.raises(ValueError, match="no field 'zip'"):
        document_path_col(nested_df, "address.zip")


def test_flatten_discovers_leaves(nested_df):
    flat = flatten_document_columns(nested_df)
    assert "address__city" in flat.columns
    assert "address__geo__lat" in flat.columns
    assert "authors__name" in flat.columns


def test_end_to_end_dotted_query_names(spark, nested_df):
    """The reference queries nested fields by dotted name
    (address.city:paris). Flat columns carry spark-safe names; the
    INDEXED name keeps the dot, so query strings match the reference
    verbatim."""
    flat = flatten_document_columns(nested_df, ["address.city", "authors.name"])
    cfg = IndexConfig(
        index_name="nested",
        unique_id_col="uid",
        number_of_shards=2,
        default_search_fields=("title",),
        field_configs=(
            FieldConfig("title", index_as=(IndexAs("title", "whitespace_lc"),)),
            FieldConfig("address__city", index_as=(IndexAs("address.city", "lcKeyword"),)),
            FieldConfig("authors__name", index_as=(IndexAs("authors.name", "lcKeyword"),)),
        ),
    )
    tables = build_index(flat, cfg).persist()
    try:
        eng = SearchEngine(tables)
        out = eng.search_string("address.city:paris")
        assert [t["uniqueId"] for t in out["topk"]] == ["1"]
        # multivalued through the array-of-structs path
        out = eng.search_string("authors.name:bob")
        assert [t["uniqueId"] for t in out["topk"]] == ["1"]
        out = eng.search_string("authors.name:dan")
        assert [t["uniqueId"] for t in out["topk"]] == ["3"]
    finally:
        tables.unpersist()

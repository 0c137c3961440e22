"""Null / empty value semantics mirrored from the reference's
NullEmptyTest.java:40-163 — exists queries over null vs empty values,
char-length and list-length meta queries on multivalued fields, and
the *:* match-all composition with negation."""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine

REPEAT = 2
UNIQUE = 7


@pytest.fixture(scope="module")
def engine(spark):
    # NullEmptyTest.index(): 7 docs per repeat — titles null/empty/
    # present, comments null / lists with empty strings / empty list
    rows = []
    for i in range(REPEAT):
        b = i * UNIQUE
        rows += [
            (str(b + 0), "something special but boring", None, 1.0),
            (str(b + 1), "something really special",
             ["reddish and blueish", "the best", "so great"], 2.4),
            (str(b + 2), "", ["pink with big big big stripes", ""], 5.0),
            (str(b + 3), None, ["real big"], 4.3),
            (str(b + 4), "something really special", ["small"], 1.6),
            (str(b + 5), "something really special", [], 4.1),
            (str(b + 6), "boring and small", [""], None),
        ]
    pdf = pd.DataFrame(rows, columns=["id", "title", "comments", "rating"])
    cfg = IndexConfig(
        index_name="nullempty",
        unique_id_col="id",
        number_of_shards=1,
        default_search_fields=("title",),
        field_configs=(
            FieldConfig("title", index_as=(IndexAs("title", "whitespace_lc"),)),
            FieldConfig("comments", index_as=(IndexAs("comments", "whitespace_lc"),)),
        ),
        store_length_meta=True,
    )
    sdf = spark.createDataFrame(
        pdf, schema="id string, title string, comments array<string>, rating double"
    )
    tables = build_index(sdf, cfg, stored_cols=("rating",)).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def _hits(eng, qs):
    return eng.search_string(qs, amount=1)["totalHits"]


def test_exists_matches_empty_but_not_null(engine):
    # title:* matches present titles INCLUDING "" (6 of 7)
    assert _hits(engine, "title:*") == REPEAT * 6
    # -title:* keeps only the null-title doc
    assert _hits(engine, "-title:*") == REPEAT


def test_wildcard_needs_at_least_one_char(engine):
    # title:*? needs >=1 character -> excludes "" and null
    assert _hits(engine, "title:*?") == REPEAT * 5
    assert _hits(engine, "-title:*?") == REPEAT * 2


def test_char_length_meta(engine):
    # |title|:0 -> the empty-string title only (null not matched)
    assert _hits(engine, "|title|:0") == REPEAT
    # |comments|:0 -> ANY comment item of length 0 (docs 2 and 6)
    assert _hits(engine, "|comments|:0") == REPEAT * 2


def test_list_length_meta(engine):
    # |||comments|||:0 -> the empty LIST only, not [""] and not null
    assert _hits(engine, "|||comments|||:0") == REPEAT
    # more than 2 comments -> the 3-item list
    assert _hits(engine, "|||comments|||>2") == REPEAT
    # exactly 2 comments -> the list with one empty item among two
    assert _hits(engine, "|||comments|||:2") == REPEAT


def test_list_exists_counts_empty_lists(engine):
    # comments:* excludes only the null-comments doc: List.of() and
    # [""] are present fields (FIELDS_LIST_FIELD semantics)
    assert _hits(engine, "comments:*") == REPEAT * 6


def test_match_all_with_negation(engine):
    # (*:* -title:*) OR title:boring -> null-title doc + 'boring' docs
    assert _hits(engine, "(*:* -title:*) OR title:boring") == REPEAT * 3

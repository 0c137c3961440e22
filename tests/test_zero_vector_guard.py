"""Store-time rejection of zero-magnitude vectors.

Lucene refuses to index a zero vector under cosine similarity
(VectorUtil.cosine throws IllegalArgumentException; the reference
inherits the check through its Lucene codecs). Round 4 stored them
and divided by zero at query time under ANSI mode; the round-5 guard
(`indexing/builder._guard_zero_vectors`) fails the BUILD instead,
naming the field and uniqueId. NULL vectors stay legal.
"""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig, VectorConfig
from zuliasearch_spark.indexing.builder import build_index


def _cfg(**vk):
    return IndexConfig(
        index_name="zvec",
        unique_id_col="uid",
        number_of_shards=2,
        default_search_fields=("tag",),
        field_configs=(
            FieldConfig("tag", index_as=(IndexAs("tag", "lcKeyword"),)),
            FieldConfig("vec", vector_as=(VectorConfig("vec", **vk),)),
        ),
        store_positions=False,
    )


def _build(spark, rows, **vk):
    pdf = pd.DataFrame(rows, columns=["uid", "tag", "vec"])
    return build_index(spark.createDataFrame(pdf), _cfg(**vk), stored_cols=("vec",))


GOOD = [("a", "x", [1.0, 0.0, 2.0]), ("b", "y", [0.5, -0.5, 0.25])]


@pytest.mark.parametrize("vk", [{}, {"encoding": "INT8"}, {"index_type": "HNSW"}])
def test_zero_vector_fails_build(spark, vk):
    rows = GOOD + [("z", "x", [0.0, 0.0, 0.0])]
    with pytest.raises(Exception, match="zero-magnitude vector.*uniqueId=z"):
        _build(spark, rows, **vk).doc_map.collect()


def test_empty_vector_fails_build(spark):
    rows = GOOD + [("e", "x", [])]
    with pytest.raises(Exception, match="zero-magnitude vector"):
        _build(spark, rows).doc_map.collect()


def test_null_vector_is_legal(spark):
    rows = GOOD + [("n", "x", None)]
    got = _build(spark, rows).doc_map.collect()
    assert {r["uniqueId"] for r in got} == {"a", "b", "n"}


def test_clean_build_unaffected(spark):
    got = _build(spark, GOOD, encoding="INT8").doc_map.collect()
    assert len(got) == 2

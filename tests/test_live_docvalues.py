"""Deleted docs must not resurface through doc-values-only paths.

Lucene masks deletions with liveDocs on EVERY access path — postings
iterators, doc-values range queries, and KNN vector search all
consult it. The postings kernels here mask tombstones in the match
vector; these tests pin the three paths that bypass the kernels
entirely (pure doc-values ranges via search_string, range-bearing
aggregations via match_ids, raw cosine KNN) to the same contract.
"""

import pandas as pd

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import SearchRequest


def _engine(spark):
    rows = [
        (f"d{i}", "alpha beta", i * 10, [float(i), 1.0, 0.0]) for i in range(10)
    ]
    cfg = IndexConfig(
        index_name="live",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "n", "vec"])
    tables = build_index(
        spark.createDataFrame(pdf), cfg, stored_cols=("n", "vec")
    ).persist()
    return SearchEngine(tables), tables


def test_pure_range_excludes_deleted(spark):
    eng, tables = _engine(spark)
    try:
        before = eng.search_string("n:[0 TO 100]", amount=20)
        assert before["totalHits"] == 10
        eng.delete_by_unique_ids(["d3", "d7"])
        after = eng.search_string("n:[0 TO 100]", amount=20)
        assert after["totalHits"] == 8
        assert not {"d3", "d7"} & {t["uniqueId"] for t in after["topk"]}
    finally:
        tables.unpersist()


def test_range_aggregation_excludes_deleted(spark):
    eng, tables = _engine(spark)
    try:
        eng.delete_by_unique_ids(["d9"])
        # range + term through match_ids (facet/stat entry point)
        req = SearchRequest(qs="content:alpha AND n:[0 TO 100]", amount=1)
        stats = eng.numeric_stats(req, "n").collect()[0]
        assert stats["count_v"] == 9
        assert stats["max_v"] == 80  # d9 (n=90) is dead
        # pure-range aggregation (no postings leaf at all)
        pure = SearchRequest(qs="n:[50 TO 100]", amount=1)
        stats2 = eng.numeric_stats(pure, "n").collect()[0]
        assert stats2["count_v"] == 4  # 50,60,70,80
    finally:
        tables.unpersist()


def test_fetch_excludes_deleted(spark):
    eng, tables = _engine(spark)
    try:
        assert eng.fetch(["d2", "d4"], fetch_type="NONE").count() == 2
        eng.delete_by_unique_ids(["d2"])
        got = [r["uniqueId"] for r in eng.fetch(["d2", "d4"], fetch_type="NONE").collect()]
        assert got == ["d4"]
    finally:
        tables.unpersist()


def test_pure_vector_matchall_excludes_deleted(spark):
    eng, tables = _engine(spark)
    try:
        eng.delete_by_unique_ids(["d9"])
        # no boolean clauses → injected MatchAll; must be LIVE docs
        top = eng.search_vector(SearchRequest(amount=3), [9.0, 1.0, 0.0], "vec", k=3)
        assert "d9" not in [t["uniqueId"] for t in top["topk"]]
    finally:
        tables.unpersist()


def test_knn_excludes_deleted(spark):
    eng, tables = _engine(spark)
    try:
        # d9's vector is the best cosine match for [9, 1, 0]
        req = SearchRequest(qs="content:alpha", amount=5)
        top = eng.search_vector(req, [9.0, 1.0, 0.0], "vec", k=3)
        assert top["topk"][0]["uniqueId"] == "d9"
        eng.delete_by_unique_ids(["d9"])
        top2 = eng.search_vector(req, [9.0, 1.0, 0.0], "vec", k=3)
        uids = [t["uniqueId"] for t in top2["topk"]]
        assert "d9" not in uids
        assert len(uids) == 3  # a dead doc must not consume a k slot
    finally:
        tables.unpersist()

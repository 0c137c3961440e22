"""Upsert (dedup-by-latest) builds + scale-safe id assignment."""

import pandas as pd

from tests.conftest import code_config
from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


def _cfg(**kw):
    base = dict(
        index_name="ups",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),),
        per_shard_stats=False,
        quantize_norms=False,
    )
    base.update(kw)
    return IndexConfig(**base)


def test_upsert_keeps_latest_version(spark):
    rows = [
        ("u0", "old stale words", 0),
        ("u1", "persistent words", 0),
        ("u0", "fresh updated words", 1),  # replaces u0@0
        ("u2", "another doc", 0),
        ("u2", "another doc rewritten", 2),  # replaces u2@0
    ]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "ver"])
    cfg = _cfg(upsert_order_col="ver")
    tables = build_index(spark.createDataFrame(pdf), cfg, stored_cols=("ver",)).persist()
    try:
        eng = SearchEngine(tables)
        assert sum(eng.get_number_of_docs().values()) == 3  # 3 distinct uids
        # old content is gone, new content found
        gone = eng.search(SearchRequest((C("FILTER", q="content:stale"),), amount=5), fetch="none")
        assert gone["totalHits"] == 0
        fresh = eng.search(SearchRequest((C("FILTER", q="content:fresh"),), amount=5))
        assert [t["uniqueId"] for t in fresh["topk"]] == ["u0"]
        rew = eng.search(SearchRequest((C("FILTER", q="content:rewritten"),), amount=5))
        assert [t["uniqueId"] for t in rew["topk"]] == ["u2"]
    finally:
        tables.unpersist()


def test_ids_dense_and_deterministic(spark, corpus_t1):
    """doc_ids are dense 0..n-1 per shard and identical across
    rebuilds of the same input (assign_ids two-pass contract)."""
    cfg = code_config(num_shards=4)
    df = spark.createDataFrame(corpus_t1)
    m1 = {
        (r["shard"], r["uniqueId"]): r["doc_id"]
        for r in build_index(df, cfg).doc_map.collect()
    }
    m2 = {
        (r["shard"], r["uniqueId"]): r["doc_id"]
        for r in build_index(spark.createDataFrame(corpus_t1), cfg).doc_map.collect()
    }
    assert m1 == m2
    by_shard: dict[int, list[int]] = {}
    for (s, _), d in m1.items():
        by_shard.setdefault(s, []).append(d)
    for s, ids in by_shard.items():
        assert sorted(ids) == list(range(len(ids))), f"shard {s} ids not dense"

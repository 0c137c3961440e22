"""Oversampled scatter-gather + short-result retry must be output-
identical to the exact (full-k-per-shard) merge.

Reference semantics: per-shard request sizing ((k/numShards) +
minShardRequest) · requestFactor (ZuliaIndex.getShardQuery:1021-1030),
short-result detection against the merged tail QueryCombiner.java:
146-382, fetchFull retry QueryRequestFederator.java:95-105."""

import pytest

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


@pytest.fixture(scope="module")
def engine(spark, corpus_t2):
    cfg = code_config(num_shards=4)
    tables = build_index(spark.createDataFrame(corpus_t2), cfg).persist()
    yield SearchEngine(tables)
    tables.unpersist()


MIX = {
    "hot": SearchRequest((C("SCORE_SHOULD", q="parse", qf=("content",)),), amount=10),
    "conj": SearchRequest(
        (C("SCORE_MUST", q="shard reader", qf=("content",), default_op="AND"),), amount=10
    ),
    "rare": SearchRequest((C("SCORE_SHOULD", q="sym_77_a", qf=("content",)),), amount=10),
    "paged": SearchRequest((C("SCORE_SHOULD", q="merge", qf=("content",)),), amount=5, start=5),
    "neg": SearchRequest(
        (C("FILTER_NOT", q="lang:go"), C("SCORE_SHOULD", q="varint", qf=("content",))),
        amount=10,
    ),
}


def _key(res):
    return {
        qid: (
            r["totalHits"],
            [(t["shard"], t["doc_id"], round(t["score"], 6)) for t in r["topk"]],
        )
        for qid, r in res.items()
    }


def test_oversampled_merge_identical(engine):
    base = engine.search_many(MIX, fetch="none")
    over = engine.search_many(MIX, fetch="none", oversample=True)
    assert _key(over) == _key(base)


def test_oversampling_actually_undersizes_shards(engine):
    # amount=10 over 4 shards: ((10/4)+2)*2 = 9 < 10, so the first
    # pass really does ask shards for less than the full page
    req = SearchRequest((C("SCORE_SHOULD", q="parse", qf=("content",)),), amount=10)
    engine.search_many({"q": req}, fetch="none", oversample=True)
    # uniform scores (CONSTANT sim): every shard's next ties the
    # merged tail, forcing the short-result retry
    creq = SearchRequest(
        (C("SCORE_SHOULD", q="parse", qf=("content",)),),
        amount=10,
        similarities=(("content", "CONSTANT"),),
    )
    base = engine.search_many({"c": creq}, fetch="none")
    over = engine.search_many({"c": creq}, fetch="none", oversample=True)
    assert engine.last_metrics.get("retried") == 1
    assert _key(over) == _key(base)

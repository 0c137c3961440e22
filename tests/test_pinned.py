"""Pinned (resident, shard-partitioned) serving must be output-
identical to the scan path, and phrase batches must transparently
fall back to the positions-bearing parquet/scan lineage."""

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


BATCH = {
    "hot": SearchRequest((C("SCORE_SHOULD", q="parse", qf=("content",)),), amount=10),
    "conj": SearchRequest(
        (C("SCORE_MUST", q="shard reader", qf=("content",), default_op="AND"),), amount=10
    ),
    "neg": SearchRequest(
        (C("FILTER_NOT", q="lang:go"), C("SCORE_SHOULD", q="varint", qf=("content",))),
        amount=10,
    ),
}


def _key(res):
    return {
        qid: [(t["shard"], t["doc_id"], round(t["score"], 6)) for t in r["topk"]]
        for qid, r in res.items()
    }


def test_pinned_results_identical(engine):
    base = engine.search_many(BATCH, fetch="none")
    engine.pin()
    try:
        pinned = engine.search_many(BATCH, fetch="none")
    finally:
        engine.unpin()
    assert _key(pinned) == _key(base)
    assert {q: r["totalHits"] for q, r in pinned.items()} == {
        q: r["totalHits"] for q, r in base.items()
    }


def test_pinned_phrase_batch_falls_back(engine):
    reqs = dict(BATCH)
    reqs["ph"] = SearchRequest(
        (C("SCORE_SHOULD", phrase=("shard", "reader"), qf=("content",)),), amount=10
    )
    base = engine.search_many(reqs, fetch="none")
    engine.pin()  # resident copy has no pos_bytes
    try:
        pinned = engine.search_many(reqs, fetch="none")
    finally:
        engine.unpin()
    assert _key(pinned) == _key(base)
    assert base["ph"]["topk"], "phrase query should match in the t2 corpus"

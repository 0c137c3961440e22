"""Rank-identical parity: Spark engine vs exhaustive Lucene-semantics oracle.

Covers the FIXTURES.md F3 matrix: rare/hot terms, OR/AND, mm,
field-scoped terms, TERMS sets, FILTER + scored combos, negation-only
(MatchAll fix-up), camelCase identifier splits, boost, pagination,
multi-shard with per-shard statistics. Assertions per F4: identical
ranked uniqueId sequence, scores within 1e-4 (they are in fact
bit-identical), totalHits exact.
"""

import numpy as np
import pytest

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.oracle.bm25_oracle import OracleIndex
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import LastResult, QueryClause, SearchRequest

C = QueryClause

REQS = {
    "rare_term": SearchRequest((C("SCORE_SHOULD", q="sym_7_a", qf=("content",)),), amount=10),
    "hot_term": SearchRequest((C("SCORE_SHOULD", q="parse", qf=("content",)),), amount=10),
    "or_multi": SearchRequest((C("SCORE_SHOULD", q="parse query node", qf=("content",)),), amount=10),
    "and_conj": SearchRequest(
        (C("SCORE_MUST", q="shard reader", qf=("content",), default_op="AND"),), amount=10
    ),
    "mm_2_of_3": SearchRequest(
        (C("SCORE_SHOULD", q="varint encode gap", qf=("content",), mm=2),), amount=10
    ),
    "field_scoped": SearchRequest((C("SCORE_SHOULD", q="lang:python content:index"),), amount=10),
    "terms_set": SearchRequest(
        (C("TERMS", terms=("org1/repo5", "org2/repo7"), qf=("repo",)),), amount=10
    ),
    "filter_scored": SearchRequest(
        (C("SCORE_SHOULD", q="index", qf=("content",)), C("FILTER", q="lang:python")), amount=10
    ),
    "negation_only": SearchRequest((C("FILTER_NOT", q="lang:go"),), amount=10),
    "not_plus_scored": SearchRequest(
        (C("FILTER_NOT", q="lang:go"), C("SCORE_SHOULD", q="varint encode", qf=("content",))),
        amount=10,
    ),
    "camel_split": SearchRequest(
        (C("SCORE_MUST", q="parseQueryNode", qf=("content",), default_op="AND"),), amount=10
    ),
    "boost_2x": SearchRequest(
        (
            C("SCORE_SHOULD", q="parse", qf=("content",), boost=2.0),
            C("SCORE_SHOULD", q="merge", qf=("content",)),
        ),
        amount=10,
    ),
    "terms_not": SearchRequest(
        (
            C("SCORE_SHOULD", q="index", qf=("content",)),
            C("TERMS_NOT", terms=("go", "js"), qf=("lang",)),
        ),
        amount=10,
    ),
}


def _assert_same(name, o, e):
    assert o["totalHits"] == e["totalHits"], f"{name}: totalHits {o['totalHits']} != {e['totalHits']}"
    o_ids = [x["uniqueId"] for x in o["topk"]]
    e_ids = [x["uniqueId"] for x in e["topk"]]
    assert o_ids == e_ids, f"{name}: rank mismatch\noracle={o_ids}\nengine={e_ids}"
    for a, b in zip(o["topk"], e["topk"]):
        assert abs(a["score"] - b["score"]) < 1e-4, f"{name}: score {a['score']} vs {b['score']}"


@pytest.fixture(scope="module")
def single_shard(spark, corpus_t1):
    cfg = code_config(num_shards=1)
    tables = build_index(spark.createDataFrame(corpus_t1), cfg).persist()
    yield OracleIndex(corpus_t1, cfg), SearchEngine(tables)
    tables.unpersist()


@pytest.fixture(scope="module")
def multi_shard(spark, corpus_t2):
    cfg = code_config(num_shards=4)
    tables = build_index(spark.createDataFrame(corpus_t2), cfg).persist()
    yield OracleIndex(corpus_t2, cfg), SearchEngine(tables)
    tables.unpersist()


@pytest.mark.parametrize("name", sorted(REQS))
def test_single_shard_parity(single_shard, name):
    oracle, engine = single_shard
    _assert_same(name, oracle.search(REQS[name]), engine.search(REQS[name]))


@pytest.mark.parametrize(
    "name", ["hot_term", "or_multi", "and_conj", "filter_scored", "mm_2_of_3", "boost_2x", "terms_set"]
)
def test_multi_shard_parity(multi_shard, name):
    oracle, engine = multi_shard
    _assert_same(name, oracle.search(REQS[name]), engine.search(REQS[name]))


def test_boost_doubles_score(single_shard):
    """BoostAndVectorShouldTest.java:99 semantics: boost=2 doubles the score."""
    oracle, engine = single_shard
    base = SearchRequest((C("SCORE_SHOULD", q="varint", qf=("content",)),), amount=5)
    boosted = SearchRequest((C("SCORE_SHOULD", q="varint", qf=("content",), boost=2.0),), amount=5)
    r1, r2 = engine.search(base), engine.search(boosted)
    assert [x["uniqueId"] for x in r1["topk"]] == [x["uniqueId"] for x in r2["topk"]]
    for a, b in zip(r1["topk"], r2["topk"]):
        assert abs(b["score"] - 2 * a["score"]) < 1e-4


def test_pagination_cursor(multi_shard):
    """amount=5 twice via LastResult cursor == amount=10 once (F3)."""
    oracle, engine = multi_shard
    q = (C("SCORE_SHOULD", q="parse query node", qf=("content",)),)
    full = engine.search(SearchRequest(q, amount=10))
    page1 = engine.search(SearchRequest(q, amount=5))
    # build cursor: per shard, last (score, doc_id) seen in page1
    marks = {}
    for row in page1["topk"]:
        marks[row["shard"]] = (row["score"], row["doc_id"])
    cursor = LastResult(tuple((s, sc, d) for s, (sc, d) in marks.items()))
    page2 = engine.search(SearchRequest(q, amount=5, last_result=cursor))
    got = [x["uniqueId"] for x in page1["topk"]] + [x["uniqueId"] for x in page2["topk"]]
    assert got == [x["uniqueId"] for x in full["topk"]]


def test_start_offset(multi_shard):
    oracle, engine = multi_shard
    q = (C("SCORE_SHOULD", q="merge segment", qf=("content",)),)
    full = engine.search(SearchRequest(q, amount=10))
    off = engine.search(SearchRequest(q, amount=5, start=5))
    assert [x["uniqueId"] for x in off["topk"]] == [x["uniqueId"] for x in full["topk"]][5:10]
    o = oracle.search(SearchRequest(q, amount=5, start=5))
    _assert_same("start_offset", o, off)


def test_sha256_invariant(spark, corpus_t1, single_shard):
    """Per-row invariant: stored content sha256 equals corpus sha256."""
    import hashlib

    _, engine = single_shard
    rows = engine.tables.doc_map.select("uniqueId", "content_sha256").collect()
    by_uid = {r["uniqueId"]: r["content_sha256"] for r in rows}
    for _, row in corpus_t1.sample(20, random_state=0).iterrows():
        want = hashlib.sha256(row["content"].encode()).hexdigest()
        assert by_uid[row["uniqueId"]] == want

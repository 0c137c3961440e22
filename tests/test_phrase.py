"""Phrase / proximity queries: positional postings end-to-end.

Engine parity runs against the exhaustive oracle, whose phrase
matcher is an independent per-doc Python scan (bm25_oracle
._phrase_freqs) versus the kernel's vectorized key-set intersection —
a shared bug cannot hide. Semantics micro-tests pin the Lucene
behaviors: exact adjacency at slop=0, the 2-term sloppy metric
("a b"~2 matches "b a", ~1 does not — Lucene SloppyPhraseMatcher),
and stopword position gaps (StopFilter increments positions, so a
dropped stopword still separates a phrase).
"""

import pandas as pd
import pytest

from tests.conftest import code_config
from zuliasearch_spark.config import (
    LOWERCASE,
    STOPWORDS,
    FieldConfig,
    IndexAs,
    IndexConfig,
)
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.oracle.bm25_oracle import OracleIndex
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

PHRASE_REQS = {
    "exact_2": SearchRequest((C("SCORE_SHOULD", phrase=("parse", "query"), qf=("content",)),), amount=10),
    "exact_3": SearchRequest(
        (C("SCORE_SHOULD", phrase=("parse", "query", "node"), qf=("content",)),), amount=10
    ),
    "camel_inside": SearchRequest(
        # camelCase phrase word splits into consecutive positions
        (C("SCORE_SHOULD", phrase=("parseQuery",), qf=("content",)),), amount=10
    ),
    "slop_2": SearchRequest(
        (C("SCORE_SHOULD", phrase=("parse", "node"), slop=2, qf=("content",)),), amount=10
    ),
    "phrase_filter": SearchRequest(
        (
            C("FILTER", phrase=("parse", "query"), qf=("content",)),
            C("SCORE_SHOULD", q="index", qf=("content",)),
        ),
        amount=10,
    ),
    "phrase_must_scored": SearchRequest(
        (C("SCORE_MUST", phrase=("shard", "reader"), qf=("content",)),), amount=10
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
def pair(spark, corpus_t2):
    cfg = code_config(num_shards=4)
    tables = build_index(spark.createDataFrame(corpus_t2), cfg).persist()
    yield OracleIndex(corpus_t2, cfg), SearchEngine(tables)
    tables.unpersist()


def test_phrase_parity(pair):
    oracle, engine = pair
    results = engine.search_many(dict(PHRASE_REQS))
    matched_any = 0
    for name, req in PHRASE_REQS.items():
        o = oracle.search(req)
        _assert_same(name, o, results[name])
        matched_any += o["totalHits"]
    assert matched_any > 0  # the corpus genuinely contains the phrases


# -- semantics micro-corpus -------------------------------------------------

SDOCS = [
    ("s0", "alpha beta gamma"),
    ("s1", "beta alpha"),
    ("s2", "alpha x beta"),
    ("s3", "alpha x y beta"),
    ("s4", "beta gamma alpha beta gamma"),
    ("s5", "alpha the beta"),  # stopword gap under STANDARD+STOPWORDS
    ("s6", "alpha beta alpha beta"),
]


def _mini_engine(spark, analyzer_filters=(LOWERCASE,)):
    from zuliasearch_spark.config import STANDARD, AnalyzerSettings

    cfg = IndexConfig(
        index_name="ph",
        unique_id_col="uniqueId",
        number_of_shards=1,
        default_search_fields=("content",),
        field_configs=(FieldConfig("content", index_as=(IndexAs("content", "a"),)),),
        analyzers={"a": AnalyzerSettings("a", STANDARD, tuple(analyzer_filters))},
        per_shard_stats=False,
        quantize_norms=False,
    )
    pdf = pd.DataFrame(SDOCS, columns=["uniqueId", "content"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    return SearchEngine(tables), tables


def _hits(eng, phrase, slop=0):
    req = SearchRequest((C("FILTER", phrase=phrase, slop=slop, qf=("content",)),), amount=50)
    res = eng.search(req)
    return {t["uniqueId"] for t in res["topk"]}


def test_phrase_semantics(spark):
    eng, tables = _mini_engine(spark)
    try:
        # s4 = "beta gamma alpha beta gamma" contains "alpha beta" at 2-3
        assert _hits(eng, ("alpha", "beta")) == {"s0", "s4", "s6"}
        # without STOPWORDS, 'the' in s5 is a real token: one-gap match
        assert _hits(eng, ("alpha", "beta"), slop=1) == {"s0", "s2", "s4", "s5", "s6"}
        # sloppy metric: out-of-order costs 2 ("beta alpha" in s1)
        assert _hits(eng, ("alpha", "beta"), slop=2) == {
            "s0", "s1", "s2", "s3", "s4", "s5", "s6",
        }
        assert "s1" not in _hits(eng, ("alpha", "beta"), slop=1)
        # 3-term exact phrase
        assert _hits(eng, ("alpha", "beta", "gamma")) == {"s0", "s4"}
        # phrase frequency scores: s6 has 2 occurrences -> TF sim = 2
        req = SearchRequest(
            (C("SCORE_SHOULD", phrase=("alpha", "beta"), qf=("content",)),),
            amount=50,
            similarities=(("content", "TF"),),
        )
        scores = {t["uniqueId"]: t["score"] for t in eng.search(req)["topk"]}
        assert scores == {"s0": 1.0, "s4": 1.0, "s6": 2.0}
    finally:
        tables.unpersist()


def test_phrase_stopword_gap(spark):
    eng, tables = _mini_engine(spark, (LOWERCASE, STOPWORDS))
    try:
        # "alpha the beta": 'the' is dropped but positions keep the gap
        assert "s5" not in _hits(eng, ("alpha", "beta"))
        assert "s5" in _hits(eng, ("alpha", "beta"), slop=1)
    finally:
        tables.unpersist()


def test_positions_off_raises(spark):
    from dataclasses import replace

    cfg = code_config(num_shards=1)
    cfg = replace(cfg, store_positions=False)
    pdf = pd.DataFrame(
        [("x0", "r", "p", "c", "python", "alpha beta")],
        columns=["uniqueId", "repo", "path", "commit", "lang", "content"],
    )
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("FILTER", phrase=("alpha", "beta"), qf=("content",)),), amount=5)
        with pytest.raises(Exception, match="positions"):
            eng.search(req)
    finally:
        tables.unpersist()

"""Multi-field AND semantics + TFIDF similarity.

The multi-field oracle here is INDEPENDENT of resolve_clause /
combine_clauses (plain Python set logic over whitespace tokens), so a
bug shared by the engine and the exhaustive oracle — like round 1's
AND-degrades-to-OR in resolve_clause — cannot hide.

Reference semantics: ZuliaMultiFieldQueryNodeProcessor.java:36-60
(each token clones into an OR group across the default fields, under
the clause occur), ShardReader.getSimilarity:537-579 (TFIDF →
ClassicSimilarity; unknown names throw).
"""

import math

import numpy as np
import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

DOCS = [
    ("d00", "alpha beta gamma", "en"),
    ("d01", "alpha beta", "en"),
    ("d02", "beta gamma", "fr"),
    ("d03", "alpha", "fr"),
    ("d04", "gamma delta", "en"),
    ("d05", "delta epsilon", "de"),
    ("d06", "en alpha", "fr"),  # 'en' as a CONTENT token
    ("d07", "epsilon", "en"),
    ("d08", "alpha alpha beta", "de"),
    ("d09", "beta beta beta", "fr"),
]


def _cfg(**kw) -> IndexConfig:
    base = dict(
        index_name="mf",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
        ),
        per_shard_stats=False,
        quantize_norms=False,
    )
    base.update(kw)
    return IndexConfig(**base)


@pytest.fixture(scope="module")
def engine(spark):
    pdf = pd.DataFrame(DOCS, columns=["uniqueId", "content", "lang"])
    tables = build_index(spark.createDataFrame(pdf), _cfg()).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def _matches(uid: str, token: str) -> bool:
    """Independent oracle: token matches doc in content OR lang."""
    row = next(d for d in DOCS if d[0] == uid)
    return token in row[1].split() or token == row[2]


def test_multifield_and_requires_every_token(engine):
    # round-1 bug: this matched docs containing ONLY one of the tokens
    req = SearchRequest(
        (C("FILTER", q="en alpha", qf=("content", "lang"), default_op="AND"),), amount=50
    )
    res = engine.search(req)
    expected = {u for u, _, _ in DOCS if _matches(u, "en") and _matches(u, "alpha")}
    got = {t["uniqueId"] for t in res["topk"]}
    assert got == expected  # d00, d01, d06 (en via lang or content; alpha)
    assert res["totalHits"] == len(expected)
    assert len(expected) >= 3  # the corpus genuinely exercises both paths


def test_multifield_or_mm_counts_token_groups(engine):
    # mm=2 of 3 TOKEN groups — a token matching in both fields still
    # counts once (groups, not leaves)
    req = SearchRequest(
        (C("SCORE_SHOULD", q="en alpha beta", qf=("content", "lang"), mm=2),), amount=50
    )
    got = {t["uniqueId"] for t in engine.search(req)["topk"]}
    expected = {
        u
        for u, _, _ in DOCS
        if sum(_matches(u, t) for t in ("en", "alpha", "beta")) >= 2
    }
    assert got == expected


def test_single_field_and_multiterm_token_unchanged(engine):
    # single-field AND where each token is one term: all must match
    req = SearchRequest(
        (C("SCORE_MUST", q="alpha beta", qf=("content",), default_op="AND"),), amount=50
    )
    got = {t["uniqueId"] for t in engine.search(req)["topk"]}
    assert got == {"d00", "d01", "d08"}


def test_tfidf_scores_match_classic_formula(engine):
    req = SearchRequest(
        (C("SCORE_SHOULD", q="alpha", qf=("content",)),),
        amount=50,
        similarities=(("content", "TFIDF"),),
    )
    res = engine.search(req)
    n_docs = sum(1 for _, c, _ in DOCS if c.split())
    df = sum(1 for _, c, _ in DOCS if "alpha" in c.split())
    idf = math.log((n_docs + 1) / (df + 1)) + 1.0
    for t in res["topk"]:
        row = next(d for d in DOCS if d[0] == t["uniqueId"])
        toks = row[1].split()
        tf = toks.count("alpha")
        expected = idf * math.sqrt(tf) / math.sqrt(len(toks))
        assert t["score"] == pytest.approx(expected, rel=1e-9)


def test_tfidf_parity_mode_float32_quantized(spark):
    pdf = pd.DataFrame(DOCS, columns=["uniqueId", "content", "lang"])
    tables = build_index(spark.createDataFrame(pdf), _cfg(quantize_norms=True)).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest(
            (C("SCORE_SHOULD", q="beta", qf=("content",)),),
            amount=50,
            similarities=(("content", "TFIDF"),),
        )
        res = eng.search(req)
        assert res["topk"]
        for t in res["topk"]:
            # every parity-mode score is an exact float32 value
            assert t["score"] == float(np.float32(t["score"]))
    finally:
        tables.unpersist()


def test_unknown_similarity_raises(engine):
    req = SearchRequest(
        (C("SCORE_SHOULD", q="alpha", qf=("content",)),),
        similarities=(("content", "LMDirichlet"),),
    )
    with pytest.raises(ValueError, match="Unknown similarity"):
        engine.search(req)


def test_analyzer_default_similarity_applies(spark):
    # an analyzer declaring TF similarity scores raw tf WITHOUT a
    # per-request override (AnalyzerSettings.getSimilarity dispatch)
    from zuliasearch_spark.config import LOWERCASE, WHITESPACE, AnalyzerSettings

    cfg = _cfg(
        analyzers={
            "ws_tf": AnalyzerSettings("ws_tf", WHITESPACE, (LOWERCASE,), similarity="TF")
        },
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "ws_tf"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
        ),
    )
    pdf = pd.DataFrame(DOCS, columns=["uniqueId", "content", "lang"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    try:
        eng = SearchEngine(tables)
        res = eng.search(
            SearchRequest((C("SCORE_SHOULD", q="beta", qf=("content",)),), amount=50)
        )
        by_uid = {t["uniqueId"]: t["score"] for t in res["topk"]}
        assert by_uid["d09"] == 3.0  # tf("beta") = 3
        assert by_uid["d00"] == 1.0
    finally:
        tables.unpersist()


def test_boost_semantics(spark, corpus_t1):
    """BoostAndVectorShouldTest.java: boost=2 exactly doubles every
    matched doc's score without changing the match set; boost=1 is a
    no-op; negative boost is rejected."""
    import pytest as _pytest

    from tests.conftest import code_config
    from zuliasearch_spark.indexing.builder import build_index
    from zuliasearch_spark.search.executor import SearchEngine
    from zuliasearch_spark.search.query import QueryClause as C
    from zuliasearch_spark.search.query import SearchRequest

    cfg = code_config(num_shards=2, quantize_norms=False)
    tables = build_index(spark.createDataFrame(corpus_t1), cfg).persist()
    try:
        eng = SearchEngine(tables)

        def res(boost):
            req = SearchRequest(
                (C("SCORE_SHOULD", q="merge", qf=("content",), boost=boost),), amount=50
            )
            r = eng.search(req, fetch="none")
            return r["totalHits"], {
                (t["shard"], t["doc_id"]): t["score"] for t in r["topk"]
            }

        n1, s1 = res(1.0)
        n2, s2 = res(2.0)
        assert n1 == n2 and set(s1) == set(s2), "boost must not change the match set"
        for k in s1:
            assert s2[k] == pytest.approx(s1[k] * 2.0, rel=1e-5)
        n0, s0 = res(1.0)
        assert s0 == s1  # boost=1 no-op / deterministic

        with _pytest.raises(ValueError, match="negative boost"):
            eng.search(
                SearchRequest(
                    (C("SCORE_SHOULD", q="merge", qf=("content",), boost=-1.0),),
                    amount=5,
                )
            )
    finally:
        tables.unpersist()

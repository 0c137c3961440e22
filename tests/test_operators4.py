"""Batch-4 operator semantics: similarity overrides, score functions,
percentiles, MLT rank monotonicity (MoreLikeThisTest.java:460-470)."""

import numpy as np
import pytest

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


@pytest.fixture(scope="module")
def engine(spark, corpus_t1):
    cfg = code_config(num_shards=1, quantize_norms=False)
    tables = build_index(spark.createDataFrame(corpus_t1), cfg).persist()
    yield SearchEngine(tables), corpus_t1
    tables.unpersist()


def test_tf_similarity_is_raw_tf(engine):
    eng, corpus = engine
    req = SearchRequest(
        (C("SCORE_SHOULD", q="varint", qf=("content",)),), amount=5, similarities=(("content", "TF"),)
    )
    res = eng.search(req)
    assert res["topk"]
    for t in res["topk"]:
        assert float(t["score"]).is_integer() and t["score"] >= 1


def test_constant_similarity_counts_matched_terms(engine):
    eng, _ = engine
    req = SearchRequest(
        (C("SCORE_SHOULD", q="varint encode merge", qf=("content",)),),
        amount=5,
        similarities=(("content", "CONSTANT"),),
    )
    res = eng.search(req)
    assert res["topk"]
    assert all(t["score"] in (1.0, 2.0, 3.0) for t in res["topk"])
    assert res["topk"][0]["score"] == max(t["score"] for t in res["topk"])


def test_percentiles_match_numpy(engine, spark):
    eng, corpus = engine
    req = SearchRequest((C("SCORE_SHOULD", q="parse", qf=("content",)),), amount=1)
    row = eng.percentile_stats(req, "doc_id", (0.5,)).collect()[0]
    matched = {t for t in eng.match_ids(req).select("doc_id").toPandas()["doc_id"]}
    # single shard: engine doc_id order == uniqueId order; compare medians
    assert abs(row["p50"] - float(np.percentile(sorted(matched), 50))) < 1e-9


def test_score_function_reranks(engine):
    eng, _ = engine
    req = SearchRequest((C("SCORE_SHOULD", q="parse merge", qf=("content",)),), amount=5)
    plain = eng.search(req)
    fn = eng.search_score_function(req, "score * 0.0 + doc_id", amount=5).collect()
    # constant-×0 + doc_id orders purely by doc_id descending
    ids = [r["doc_id"] for r in fn]
    assert ids == sorted(ids, reverse=True)
    assert plain["topk"]


def test_mlt_rank_monotonic(engine):
    """The source doc's own content must rank itself first when it is
    in the corpus (rank-order sanity as in MoreLikeThisTest)."""
    eng, corpus = engine
    row = corpus.iloc[3]
    res = eng.more_like_this(row["content"], "content", amount=5, min_doc_freq=2, max_doc_freq_pct=95)
    assert res["terms"], "MLT should derive terms from a 200-doc corpus"
    assert res["topk"], "MLT query should match documents"
    assert res["topk"][0]["uniqueId"] == row["uniqueId"]


def test_numeric_stats_multivalued_counts(spark):
    """Stats.java / StatFacetNoValueTest count semantics: value_count
    counts every element of a multivalued field, doc_count counts docs
    with >=1 value, all_doc_count counts every matched doc."""
    import pandas as pd

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing.builder import build_index
    from zuliasearch_spark.search.executor import SearchEngine
    from zuliasearch_spark.search.query import QueryClause as C
    from zuliasearch_spark.search.query import SearchRequest

    rows = [
        ("s0", "x", [1.0, 2.0]),
        ("s1", "x", [5.0]),
        ("s2", "x", []),
        ("s3", "x", None),
    ]
    cfg = IndexConfig(
        index_name="mvstats",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "vals"])
    tables = build_index(
        spark.createDataFrame(pdf, "uniqueId string, content string, vals array<double>"),
        cfg,
        stored_cols=("vals",),
    ).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("FILTER", q="content:x"),), amount=1)
        r = eng.numeric_stats(req, "vals").collect()[0]
        assert r["all_doc_count"] == 4
        assert r["doc_count"] == 2
        assert r["count_v"] == 3
        assert r["min_v"] == 1.0 and r["max_v"] == 5.0 and r["sum_v"] == 8.0
    finally:
        tables.unpersist()


def test_percentile_sketch_error_bound_and_signs(spark):
    """DDSketch percentiles (Stats.java / StatCombiner.java): the
    estimate is within the relative-accuracy bound of the sample
    element at rank floor(q*(n-1)) — the element getValueAtQuantile's
    cumulative walk lands on — including the negative-store and
    zero-count paths the positive-only gate never exercises."""
    import pandas as pd

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing.builder import build_index

    vals = [float(v) for v in range(-60, 61)]  # negatives, one zero, positives
    rows = [(f"d{i}", "alpha", v) for i, v in enumerate(vals)]
    cfg = IndexConfig(
        index_name="ddsketch",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "val"])
    tables = build_index(spark.createDataFrame(pdf), cfg, stored_cols=("val",)).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("FILTER", q="content:alpha"),), amount=1)
        alpha = 0.01
        qs = (0.05, 0.25, 0.5, 0.75, 0.95)
        row = eng.percentile_sketch_stats(req, "val", qs, precision=alpha).collect()[0]
        srt = sorted(vals)
        n = len(srt)
        for q in qs:
            exact = srt[int(np.floor(q * (n - 1)))]
            est = row[f"p{int(q * 100)}"]
            if exact == 0.0:
                assert est == 0.0
            else:
                assert abs(est - exact) <= alpha * abs(exact) + 1e-12, (q, est, exact)
    finally:
        tables.unpersist()


def test_bool_field_formats(spark):
    """BooleanFormatTest: every accepted spelling stores and queries as
    the same value; invalid values fail the build; facets label
    True/False and agree with the query counts."""
    import pandas as pd

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing.builder import bool_coerce, build_index

    # "1.0"/"0.0" model TYPED-NUMBER document values (the reference's
    # Number path accepts doubleValue() == 1/0); the strict STRING
    # lexicon rejects them — asserted separately below
    true_vals = ["true", "TRUE", "T", "yes", "Yes", "y", "1", "1.0"]
    false_vals = ["false", "FALSE", "F", "no", "No", "n", "0", "0.0"]
    rows = [(f"t{i}", "alpha", v) for i, v in enumerate(true_vals)]
    rows += [(f"f{i}", "alpha", v) for i, v in enumerate(false_vals)]
    cfg = IndexConfig(
        index_name="boolfmt",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "raw"])
    corpus = spark.createDataFrame(pdf).withColumn("flag", bool_coerce("raw"))
    tables = build_index(corpus, cfg, stored_cols=("flag",)).persist()
    try:
        eng = SearchEngine(tables)
        # every query-side spelling in the string lexicon coerces to
        # the same value (query text is always a STRING, so the strict
        # BooleanUtil.parseBoolean(String) forms apply)
        for q in ("true", "T", "yes", "1"):
            res = eng.search_string(f"content:alpha AND flag:{q}", amount=1)
            assert res["totalHits"] == len(true_vals), q
        for q in ("false", "n", "0"):
            res = eng.search_string(f"content:alpha AND flag:{q}", amount=1)
            assert res["totalHits"] == len(false_vals), q
        # unrecognized query spellings map to -1 and match NOTHING
        # (getStringAsBooleanInt via ZuliaPointQueryNodeProcessor:185)
        # — including "1.0", which the STRING lexicon does not accept
        for q in ("maybe", "2", "1.0"):
            res = eng.search_string(f"content:alpha AND flag:{q}", amount=1)
            assert res["totalHits"] == 0, q
        # facets label True/False and agree with the query counts
        req = SearchRequest((C("FILTER", q="content:alpha"),), amount=1)
        counts = {r["value"]: r["cnt"] for r in eng.facet_counts(req, "flag").collect()}
        assert counts == {"True": len(true_vals), "False": len(false_vals)}
    finally:
        tables.unpersist()
    # invalid store-time values fail the build
    bad = spark.createDataFrame(
        pd.DataFrame([("b0", "alpha", "maybe")], columns=["uniqueId", "content", "raw"])
    ).withColumn("flag", bool_coerce("raw"))
    with pytest.raises(Exception, match="invalid boolean"):
        build_index(bad, cfg, stored_cols=("flag",)).doc_map.collect()
    # strict STRING lexicon: "1.0" is rejected at store time (the
    # reference only accepts it as a typed Number), "1" is accepted
    strict = spark.createDataFrame(
        pd.DataFrame([("s0", "alpha", "1.0")], columns=["uniqueId", "content", "raw"])
    ).withColumn("flag", bool_coerce("raw", string_input=True))
    with pytest.raises(Exception, match="invalid boolean"):
        build_index(strict, cfg, stored_cols=("flag",)).doc_map.collect()
    ok = spark.createDataFrame(
        pd.DataFrame([("s1", "alpha", " 1 ")], columns=["uniqueId", "content", "raw"])
    ).withColumn("flag", bool_coerce("raw", string_input=True))
    assert build_index(ok, cfg, stored_cols=("flag",)).doc_map.count() == 1


def test_query_result_cache(spark):
    """Query-result cache (shardQueryCacheSize /
    shardQueryCacheMaxAmount, zulia_index.proto:43-44; CacheTest):
    a repeated request serves from the LRU without a Spark job,
    deletes invalidate, and deeper-than-max requests bypass."""
    import pandas as pd

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing.builder import build_index
    from zuliasearch_spark.search.executor import SearchEngine
    from zuliasearch_spark.search.query import QueryClause as C
    from zuliasearch_spark.search.query import SearchRequest

    rows = [(f"c{i}", "alpha beta") for i in range(6)]
    cfg = IndexConfig(
        index_name="qcache",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
        query_cache_size=8,
        query_cache_max_amount=10,
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("SCORE_SHOULD", q="alpha", qf=("content",)),), amount=5)
        r1 = eng.search(req, fetch="none")
        assert len(eng._query_cache) == 1
        # second call: cache hit — spy that no new Spark job runs
        SparkDF = type(tables.doc_map)
        calls = []
        orig = SparkDF.collect

        def spy(self):
            calls.append(1)
            return orig(self)

        SparkDF.collect = spy
        try:
            r2 = eng.search(req, fetch="none")
        finally:
            SparkDF.collect = orig
        assert not calls, "cache hit must not run Spark"
        # the hit reports fullyCached/shardsCached (SearchResult
        # cache observability); everything else is identical
        assert not r1["fullyCached"] and r2["fullyCached"]
        assert r1["shardsCached"] == 0 and r2["shardsCached"] == 2
        _cache_keys = ("fullyCached", "shardsCached", "shardsPinned")
        assert {k: v for k, v in r2.items() if k not in _cache_keys} == {
            k: v for k, v in r1.items() if k not in _cache_keys
        }
        # mutating the returned dict must not poison the cache
        r2["topk"].clear()
        assert eng.search(req, fetch="none")["topk"] == r1["topk"]
        # realtime bypasses the cache both ways (CacheTest: realtime
        # searches are never served from nor stored to the cache)
        rt = SearchRequest(
            (C("SCORE_SHOULD", q="alpha", qf=("content",)),), amount=5, realtime=True
        )
        rr = eng.search(rt, fetch="none")
        assert not rr["fullyCached"] and (rt, "none") not in eng._query_cache
        # pinToCache entries live in the pinned region and survive
        # LRU pressure (CacheTest pinned search stays cached)
        pinned_req = SearchRequest(
            (C("SCORE_SHOULD", q="beta", qf=("content",)),), amount=5, pin_to_cache=True
        )
        eng.search(pinned_req, fetch="none")
        # cache identity excludes the pin flag (CacheTest: the
        # unpinned repeat of a pinned warming search still hits)
        import dataclasses as _dc

        pinned_key = (_dc.replace(pinned_req, pin_to_cache=False), "none")
        assert pinned_key in eng._pinned_query_cache
        for i in range(12):  # overflow the 8-entry LRU
            eng.search(
                SearchRequest(
                    (C("SCORE_SHOULD", q="alpha", qf=("content",)),), amount=i + 1
                ),
                fetch="none",
            )
        assert len(eng._query_cache) <= 8
        assert eng.search(pinned_req, fetch="none")["fullyCached"]
        # deletes invalidate BOTH regions
        eng.delete_by_unique_ids(["c0"])
        r3 = eng.search(req, fetch="none")
        assert r3["totalHits"] == r1["totalHits"] - 1
        assert not eng._pinned_query_cache
        # requests deeper than max amount bypass the cache
        deep = SearchRequest((C("SCORE_SHOULD", q="alpha", qf=("content",)),), amount=50)
        eng.search(deep, fetch="none")
        assert (deep, "none") not in eng._query_cache
    finally:
        tables.unpersist()

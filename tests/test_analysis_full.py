"""Full AnalysisRequest surface (zulia_query.proto:260-286) against a
brute-force Python oracle on a 2-shard per-shard-stats index.

Reference semantics under test (AnalysisHandler.java:44-209,
TermFreq.java, DocFreq.java, QueryCombiner.java:208-235):

- termSort TFIDF (ClassicSimilarity sqrt(tf)·idf, float32 factors,
  per-SHARD docFreq/numDocs) / TF / ABC
- min/maxWordLen skip filters, then shard doc-freq bounds with
  percentage thresholds round(numDocs·perc) and absolute counts
  overriding percentages
- summaryType ALL_TERMS_TOP_N vs TOP_TERMS_TOP_N
- the raw ``tokens`` stream (pre-filter, document order)
- cross-shard merge: termFreq/docFreq/score summed per term, one
  final topN cut; topN == 0 returns everything
"""

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import code_config
from zuliasearch_spark.analysis.analyzers import analyze_query_text
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest
from zuliasearch_spark.util.hashing import find_shard_for_unique_id

ANALYZER = "code_standard"  # same analyzer the content field indexes with,
# so the oracle's df equals the term_stats df


@pytest.fixture(scope="module")
def engine(spark, corpus_t1):
    df = spark.createDataFrame(corpus_t1)
    cfg = code_config(num_shards=2, quantize_norms=False)
    tables = build_index(df, cfg, stored_cols=("path", "content")).persist()
    yield SearchEngine(tables), df
    tables.unpersist()


@pytest.fixture(scope="module")
def oracle(engine, corpus_t1):
    """Python-side corpus model: per-doc tokens, shard, per-shard df."""
    eng, _ = engine
    settings = eng.config.analyzer(ANALYZER)
    docs = {}
    for _, row in corpus_t1.iterrows():
        uid = row["uniqueId"]
        toks = analyze_query_text(row["content"], settings)
        docs[uid] = {
            "shard": find_shard_for_unique_id(uid, 2),
            "tokens": toks,
            "tf": Counter(toks),
        }
    ndocs = Counter(d["shard"] for d in docs.values())
    df_by_shard: dict[int, Counter] = {0: Counter(), 1: Counter()}
    for d in docs.values():
        for t in set(d["tokens"]):
            df_by_shard[d["shard"]][t] += 1
    return docs, dict(ndocs), df_by_shard


def _matched_uids(eng, q="content:def"):
    req = SearchRequest((C("FILTER", q=q),), amount=1)
    rows = (
        eng.match_ids(req)
        .join(eng.tables.doc_map, ["shard", "doc_id"])
        .select("uniqueId")
        .collect()
    )
    return req, sorted(r["uniqueId"] for r in rows)


def _docs_df(df):
    return df.select("uniqueId", F.col("content").alias("text"))


def _classic_score(tf, df, ndocs):
    """float32-faithful sqrt(tf)·idf (DocFreq.getScoreForTerm)."""
    tf_f = np.float32(math.sqrt(tf))
    idf_f = np.float32(math.log((ndocs + 1) / (df + 1.0)) + 1.0)
    return float(np.float32(tf_f * idf_f))


def _summary_oracle(oracle, uids, term_sort="TFIDF", min_word_len=0,
                    max_word_len=0, min_freq=None, max_freq=None,
                    per_doc_top_n=None):
    """ALL_TERMS (default) or TOP_TERMS (per_doc_top_n) summary rows:
    {term: (term_freq, doc_freq, score)} merged across shards."""
    docs, ndocs, df_by_shard = oracle
    per_shard_tf: dict[int, Counter] = {0: Counter(), 1: Counter()}
    for uid in uids:
        d = docs[uid]
        s = d["shard"]
        kept = {}
        for t, c in d["tf"].items():
            if min_word_len and len(t) < min_word_len:
                continue
            if max_word_len and len(t) > max_word_len:
                continue
            dfv = df_by_shard[s][t]
            if min_freq is not None and dfv < min_freq[s]:
                continue
            if max_freq is not None and max_freq[s] and dfv > max_freq[s]:
                continue
            kept[t] = c
        if per_doc_top_n is not None:
            if term_sort == "TF":
                key = lambda kv: (-kv[1], kv[0])
            elif term_sort == "ABC":
                key = lambda kv: kv[0]
            else:
                key = lambda kv: (
                    -_classic_score(kv[1], df_by_shard[s][kv[0]], ndocs[s]),
                    kv[0],
                )
            kept = dict(sorted(kept.items(), key=key)[:per_doc_top_n])
        per_shard_tf[s].update(kept)
    merged: dict[str, list] = {}
    for s, tfc in per_shard_tf.items():
        for t, tf in tfc.items():
            score = _classic_score(tf, df_by_shard[s][t], ndocs[s])
            row = merged.setdefault(t, [0, 0, 0.0])
            row[0] += tf
            row[1] += df_by_shard[s][t]
            row[2] += score
    return merged


def test_summary_tfidf_per_shard_merge(engine, oracle):
    """TFIDF summary over a 2-shard index: per-shard sqrt(tf)·idf with
    that shard's df/numDocs, scores SUMMED at the combiner."""
    eng, df = engine
    req, uids = _matched_uids(eng)
    out = eng.analysis_summary(
        req, _docs_df(df), ["uniqueId"], "text", ANALYZER, top_n=0, term_sort="TFIDF", field="content"
    ).collect()
    exp = _summary_oracle(oracle, uids)
    assert len(out) == len(exp)
    for r in out:
        e = exp[r["term"]]
        assert int(r["term_freq"]) == e[0], r["term"]
        assert int(r["doc_freq"]) == e[1], r["term"]
        assert r["score"] == pytest.approx(e[2], rel=1e-6), r["term"]
    # ordering: score desc, term asc
    keys = [(-round(r["score"], 9), r["term"]) for r in out]
    assert keys == sorted(keys)


def test_summary_abc_sort_and_topn(engine, oracle):
    eng, df = engine
    req, uids = _matched_uids(eng)
    rows = eng.analysis_summary(
        req, _docs_df(df), ["uniqueId"], "text", ANALYZER, top_n=7, term_sort="ABC", field="content"
    ).collect()
    exp = sorted(_summary_oracle(oracle, uids, term_sort="ABC"))[:7]
    assert [r["term"] for r in rows] == exp
    # ABC/TF sorts never expose a TFIDF score (reference leaves it 0)
    assert all(r["score"] == 0.0 for r in rows)


def test_word_length_filters(engine, oracle):
    eng, df = engine
    req, uids = _matched_uids(eng)
    rows = eng.analysis_summary(
        req, _docs_df(df), ["uniqueId"], "text", ANALYZER,
        top_n=0, term_sort="TF", min_word_len=3, max_word_len=6, field="content",
    ).collect()
    exp = _summary_oracle(oracle, uids, term_sort="TF", min_word_len=3, max_word_len=6)
    assert {r["term"] for r in rows} == set(exp)
    assert all(3 <= len(r["term"]) <= 6 for r in rows)
    for r in rows:
        assert int(r["term_freq"]) == exp[r["term"]][0]


def test_shard_freq_perc_threshold(engine, oracle):
    """minShardFreqPerc resolves to round(numDocs·perc) per shard
    (DocFreq.getNumDocsForPercent), evaluated against that shard's df."""
    eng, df = engine
    docs, ndocs, df_by_shard = oracle
    req, uids = _matched_uids(eng)
    perc = 0.12
    rows = eng.analysis_summary(
        req, _docs_df(df), ["uniqueId"], "text", ANALYZER,
        top_n=0, term_sort="TF", min_shard_freq_perc=perc, field="content",
    ).collect()
    lo = {s: int(round(n * perc)) for s, n in ndocs.items()}
    exp = _summary_oracle(oracle, uids, term_sort="TF", min_freq=lo)
    assert {r["term"]: int(r["term_freq"]) for r in rows} == {
        t: v[0] for t, v in exp.items()
    }
    # the filter must have dropped something for the test to mean anything
    unfiltered = _summary_oracle(oracle, uids, term_sort="TF")
    assert len(exp) < len(unfiltered)


def test_absolute_freq_overrides_perc(engine, oracle):
    """minShardFreq (absolute) overrides minShardFreqPerc
    (AnalysisHandler ctor :70-84: the count assignment wins)."""
    eng, df = engine
    docs, ndocs, df_by_shard = oracle
    req, uids = _matched_uids(eng)
    rows = eng.analysis_summary(
        req, _docs_df(df), ["uniqueId"], "text", ANALYZER,
        top_n=0, term_sort="TF", min_shard_freq=5, min_shard_freq_perc=0.9, field="content",
    ).collect()
    lo = {s: 5 for s in ndocs}  # absolute wins over round(n·0.9)
    exp = _summary_oracle(oracle, uids, term_sort="TF", min_freq=lo)
    assert {r["term"] for r in rows} == set(exp)


def test_doc_terms_tfidf_per_shard(engine, oracle):
    eng, df = engine
    docs, ndocs, df_by_shard = oracle
    req, uids = _matched_uids(eng)
    docs2 = df.select(
        F.abs(F.xxhash64("uniqueId")).alias("nid"), "uniqueId",
        F.col("content").alias("text"),
    )
    out = eng.analysis_doc_terms(
        req, docs2, ["uniqueId"], "text", "nid", ANALYZER, top_n=3, term_sort="TFIDF", field="content"
    ).toPandas()
    nid_of = {r["nid"]: r["uniqueId"] for r in docs2.collect()}
    assert set(out["nid"].map(nid_of)) == set(uids)
    for nid, grp in out.groupby("nid"):
        d = docs[nid_of[nid]]
        s = d["shard"]
        exp = sorted(
            d["tf"].items(),
            key=lambda kv: (
                -_classic_score(kv[1], df_by_shard[s][kv[0]], ndocs[s]),
                kv[0],
            ),
        )[:3]
        ranked = grp.sort_values(["score", "term"], ascending=[False, True])
        assert [(t, int(c)) for t, c in zip(ranked["term"], ranked["tf"])] == exp
        for _, r in grp.iterrows():
            assert int(r["df"]) == df_by_shard[s][r["term"]]
            assert r["score"] == pytest.approx(
                _classic_score(int(r["tf"]), df_by_shard[s][r["term"]], ndocs[s]),
                rel=1e-6,
            )


def test_tokens_stream_pre_filter(engine, oracle):
    """AnalysisRequest.tokens: document-order emitted stream, BEFORE
    word-length / freq filters (AnalysisHandler.java:124-126)."""
    eng, df = engine
    docs, _, _ = oracle
    req, uids = _matched_uids(eng, q="content:merge")
    assert uids, "need a non-empty match set"
    docs2 = df.select(
        F.abs(F.xxhash64("uniqueId")).alias("nid"), "uniqueId",
        F.col("content").alias("text"),
    )
    out = eng.analysis_tokens(req, docs2, ["uniqueId"], "text", "nid", ANALYZER).toPandas()
    nid_of = {r["nid"]: r["uniqueId"] for r in docs2.collect()}
    for nid, grp in out.groupby("nid"):
        seq = list(grp.sort_values("pos")["token"])
        assert seq == docs[nid_of[nid]]["tokens"]
        assert list(grp.sort_values("pos")["pos"]) == list(range(len(seq)))


def test_top_terms_summary_type(engine, oracle):
    """TOP_TERMS_TOP_N feeds only each doc's topN terms into the
    summary (AnalysisHandler.java:169-177) — strictly fewer (or equal)
    accumulated occurrences than ALL_TERMS_TOP_N."""
    eng, df = engine
    req, uids = _matched_uids(eng)
    top = eng.analysis_summary(
        req, _docs_df(df), ["uniqueId"], "text", ANALYZER,
        top_n=5, term_sort="TF", summary_type="TOP_TERMS_TOP_N", field="content",
    ).collect()
    exp = _summary_oracle(oracle, uids, term_sort="TF", per_doc_top_n=5)
    exp_top = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))[:5]
    assert [(r["term"], int(r["term_freq"])) for r in top] == [
        (t, v[0]) for t, v in exp_top
    ]
    all_terms = _summary_oracle(oracle, uids, term_sort="TF")
    assert sum(v[0] for v in exp.values()) < sum(v[0] for v in all_terms.values())


def test_unknown_sort_and_summary_type_raise(engine):
    eng, df = engine
    req = SearchRequest((C("FILTER", q="content:def"),), amount=1)
    with pytest.raises(ValueError, match="termSort"):
        eng.analysis_summary(
            req, _docs_df(df), ["uniqueId"], "text", ANALYZER, term_sort="BOGUS"
        ).collect()
    with pytest.raises(ValueError, match="summaryType"):
        eng.analysis_summary(
            req, _docs_df(df), ["uniqueId"], "text", ANALYZER, summary_type="BOGUS"
        ).collect()

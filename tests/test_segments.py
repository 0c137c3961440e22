"""Segmented build: checkpoint/resume, lineage manifest, optimize-merge.

Mirrors the reference's commit + resume semantics
(ShardWriteManager.java:181-220 two-phase commit; Optimize
zulia_service.proto:303-309): a killed build resumes from the last
committed segment; a merged (optimized) index answers queries
identically to the multi-segment one.
"""

import pytest

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.indexing.segments import (
    SegmentedIndexWriter,
    committed_segments,
    optimize,
    read_manifest,
    read_segmented_index,
)
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

REQS = {
    "or3": SearchRequest((C("SCORE_SHOULD", q="parse query node", qf=("content",)),), amount=10),
    "and2": SearchRequest(
        (C("SCORE_MUST", q="shard reader", qf=("content",), default_op="AND"),), amount=10
    ),
    "rare": SearchRequest((C("SCORE_SHOULD", q="sym_7_a", qf=("content",)),), amount=10),
    "filtered": SearchRequest(
        (C("SCORE_SHOULD", q="index", qf=("content",)), C("FILTER", q="lang:python")), amount=10
    ),
}


def _results(engine):
    """(totalHits, rounded scores, uniqueIds at NON-TIED positions).

    Doc-id assignment differs between segmented and single-shot
    builds, so ties (equal scores) legitimately resolve to different
    docs — scores and hit counts must still agree exactly.
    """
    out = {}
    for name, req in REQS.items():
        r = engine.search(req)
        scores = [round(x["score"], 4) for x in r["topk"]]
        uids = [
            x["uniqueId"]
            for s, x in zip(scores, r["topk"])
            if scores.count(s) == 1
        ]
        out[name] = (r["totalHits"], scores, uids)
    return out


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_t2):
    return spark.createDataFrame(corpus_t2)


@pytest.fixture(scope="module")
def baseline(spark, corpus_df):
    cfg = code_config(num_shards=2)
    tables = build_index(corpus_df, cfg).persist()
    yield _results(SearchEngine(tables))
    tables.unpersist()


def test_resume_after_crash(spark, corpus_df, baseline, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("segidx"))
    cfg = code_config(num_shards=2)
    w = SegmentedIndexWriter(path, cfg, n_segments=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        w.build(corpus_df, fail_after=2)
    assert committed_segments(path) == {0, 1}

    # a fresh writer resumes: builds ONLY the remaining segments
    w2 = SegmentedIndexWriter(path, cfg, n_segments=4)
    built = w2.build(corpus_df)
    assert built == [2, 3]
    assert committed_segments(path) == {0, 1, 2, 3}

    # lineage: every entry carries per-partition rows and doc counts
    manifest = read_manifest(path)
    assert len(manifest) == 4
    for e in manifest:
        assert e["status"] == "committed"
        assert e["num_docs"] > 0 and e["wall_s"] >= 0
        assert {p["field"] for p in e["partitions"]} >= {"content", "lang"}
        assert all(p["blocks"] > 0 and p["bytes"] > 0 for p in e["partitions"])
    assert sum(e["num_docs"] for e in manifest) == corpus_df.count()

    # queries over the segmented read match the single-shot build
    tables = read_segmented_index(spark, path, cfg).persist()
    got = _results(SearchEngine(tables))
    assert got == baseline
    tables.unpersist()

    # optimize: force-merge to one segment, answers unchanged
    out = str(tmp_path_factory.mktemp("segopt"))
    merged = optimize(spark, path, out, cfg)
    assert committed_segments(out) == {0}
    merged.persist()
    got_m = _results(SearchEngine(merged))
    assert got_m == baseline
    merged.unpersist()


def test_idempotent_build(spark, corpus_df, tmp_path_factory):
    """A second build() call on a fully-committed index is a no-op."""
    path = str(tmp_path_factory.mktemp("segidem"))
    cfg = code_config(num_shards=2)
    w = SegmentedIndexWriter(path, cfg, n_segments=2)
    assert len(w.build(corpus_df)) == 2
    assert w.build(corpus_df) == []

"""Distributed stat-facet merge with sum-error bounds, mirroring
StatCombinerTest.java scenario by scenario: per-shard top-N-by-sum
truncation, maxSumError = Σ min-returned-sum of shards that did not
report the label, hasError flags, the shardFacets=-1 exact path, and
no error when a label is reported by every shard."""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest
from zuliasearch_spark.util.hashing import find_shard_for_unique_id

REQ = SearchRequest((C("FILTER", q="content:alpha"),), amount=1)


def _engine(spark, name, dist):
    """dist: {shard: [(facet, amount), ...]} — one doc per entry."""
    n_shards = max(dist) + 1
    pools = {s: [] for s in dist}
    need = {s: len(lst) for s, lst in dist.items()}
    i = 0
    while any(len(pools[s]) < need[s] for s in pools):
        uid = f"u{i}"
        s = find_shard_for_unique_id(uid, n_shards)
        if s in pools and len(pools[s]) < need[s]:
            pools[s].append(uid)
        i += 1
    rows = []
    for s, lst in dist.items():
        it = iter(pools[s])
        for facet, amount in lst:
            rows.append((next(it), "alpha", facet, amount))
    cfg = IndexConfig(
        index_name=name,
        unique_id_col="uniqueId",
        number_of_shards=n_shards,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "cat", "amount"])
    tables = build_index(
        spark.createDataFrame(pdf), cfg, stored_cols=("cat", "amount")
    ).persist()
    return SearchEngine(tables), tables


def test_error_bound_calculation(spark):
    # StatCombinerTest.testErrorBoundCalculation: 3 shards, each
    # truncated to its top 2 labels by sum
    dist = {
        0: [("facetA", 100), ("facetB", 50)],
        1: [("facetA", 80), ("facetC", 30)],
        2: [("facetB", 60), ("facetC", 40)],
    }
    eng, t = _engine(spark, "statcomb1", dist)
    try:
        rows = {
            r["value"]: r
            for r in eng.stat_facets_sharded(REQ, "cat", "amount", top_n=10, shard_facets=2).collect()
        }
        assert rows["facetA"]["sum_v"] == 180 and rows["facetA"]["max_sum_error"] == 40
        assert rows["facetB"]["sum_v"] == 110 and rows["facetB"]["max_sum_error"] == 30
        assert rows["facetC"]["sum_v"] == 70 and rows["facetC"]["max_sum_error"] == 50
        assert all(rows[v]["has_error"] for v in ("facetA", "facetB", "facetC"))
    finally:
        t.unpersist()


def test_error_bound_multiple_missing_shards(spark):
    # testErrorBoundWithMultipleMissingShards: facetA only in shard 0
    # -> error = 30 (shard1 min) + 40 (shard2 min) = 70
    dist = {
        0: [("facetA", 100), ("facetB", 50)],
        1: [("facetB", 80), ("facetC", 30)],
        2: [("facetB", 60), ("facetC", 40)],
    }
    eng, t = _engine(spark, "statcomb2", dist)
    try:
        rows = {
            r["value"]: r
            for r in eng.stat_facets_sharded(REQ, "cat", "amount", top_n=10, shard_facets=2).collect()
        }
        assert rows["facetA"]["has_error"]
        assert rows["facetA"]["max_sum_error"] == 70
    finally:
        t.unpersist()


def test_no_error_when_all_facets_requested(spark):
    # testNoErrorWhenAllFacetsRequested: shardFacets=-1 -> exact merge
    dist = {0: [("facetA", 100)], 1: [("facetB", 50)]}
    eng, t = _engine(spark, "statcomb3", dist)
    try:
        rows = eng.stat_facets_sharded(REQ, "cat", "amount", top_n=10, shard_facets=-1).collect()
        assert {r["value"] for r in rows} == {"facetA", "facetB"}
        assert all(not r["has_error"] and r["max_sum_error"] == 0 for r in rows)
    finally:
        t.unpersist()


def test_no_error_when_facet_in_all_shards(spark):
    # testNoErrorWhenFacetPresentInAllShards: both shards returned
    # fewer labels than shardFacets (full lists), so nothing is missing
    dist = {0: [("facetA", 100)], 1: [("facetA", 50)]}
    eng, t = _engine(spark, "statcomb4", dist)
    try:
        rows = eng.stat_facets_sharded(REQ, "cat", "amount", top_n=10, shard_facets=2).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["value"] == "facetA" and r["sum_v"] == 150
        assert not r["has_error"] and r["max_sum_error"] == 0
        assert r["count_v"] == 2 and r["all_doc_count"] == 2
        assert r["min_v"] == 50 and r["max_v"] == 100
    finally:
        t.unpersist()


def test_merged_sums_never_exceed_truth_plus_error(spark):
    # the combiner contract over a denser distribution
    dist = {
        0: [("a", 10), ("a", 9), ("b", 8), ("c", 5)],
        1: [("b", 9), ("c", 7), ("e", 6), ("a", 2)],
        2: [("c", 4), ("d", 4), ("a", 1)],
    }
    eng, t = _engine(spark, "statcomb5", dist)
    try:
        truth = {}
        for lst in dist.values():
            for v, amt in lst:
                truth[v] = truth.get(v, 0) + amt
        df = eng.stat_facets_sharded(REQ, "cat", "amount", top_n=-1, shard_facets=2)
        for r in df.collect():
            assert r["sum_v"] <= truth[r["value"]] <= r["sum_v"] + r["max_sum_error"], r
    finally:
        t.unpersist()

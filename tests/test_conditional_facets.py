"""Conditional facet/stat cost guards, mirroring
GeneralFeaturesTest.conditionalFacetsTest: maxTotalHitsForFacet and
maxShardHitsForFacet SKIP the facet (client null) instead of
computing it — never truncate to a sample — with the shard limit
falling back to the total limit when 0 (ShardReader.java:331-338;
QueryCombiner.java:190-206)."""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest
from zuliasearch_spark.util.hashing import find_shard_for_unique_id

REQ = SearchRequest((C("FILTER", q="content:alpha"),), amount=1)


def _mint_uids(dist):
    """dist: {shard: n_docs} -> {shard: [uid...]} via djb2 routing."""
    n_shards = max(dist) + 1
    pools = {s: [] for s in dist}
    i = 0
    while any(len(pools[s]) < dist[s] for s in pools):
        uid = f"u{i}"
        s = find_shard_for_unique_id(uid, n_shards)
        if s in pools and len(pools[s]) < dist[s]:
            pools[s].append(uid)
        i += 1
    return pools


@pytest.fixture(scope="module")
def engine(spark):
    # 3 docs in shard 0, 2 in shard 1 (5 total), categories cycling
    pools = _mint_uids({0: 3, 1: 2})
    cats = iter(["tech", "tech", "food", "tech", "travel"])
    rows = [
        (uid, "alpha", next(cats), float(i))
        for i, uid in enumerate(pools[0] + pools[1], start=1)
    ]
    cfg = IndexConfig(
        index_name="condfacets",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "cat", "rating"])
    tables = build_index(
        spark.createDataFrame(pdf), cfg, stored_cols=("cat", "rating")
    ).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def test_total_threshold_above_hits_returns_facet(engine):
    df = engine.facet_counts(REQ, "cat", top_n=10, max_total_hits=100)
    assert df is not None
    assert {r["value"]: r["cnt"] for r in df.collect()} == {
        "tech": 3, "food": 1, "travel": 1,
    }


def test_total_threshold_below_hits_skips_facet(engine):
    # 5 hits > threshold 1 -> facet dropped entirely, not sampled
    assert engine.facet_counts(REQ, "cat", top_n=10, max_total_hits=1) is None


def test_threshold_equal_to_hits_returns_facet(engine):
    # reference keeps the facet when totalHits <= threshold
    assert engine.facet_counts(REQ, "cat", top_n=10, max_total_hits=5) is not None


def test_zero_threshold_means_no_limit(engine):
    assert engine.facet_counts(REQ, "cat", top_n=10) is not None


def test_shard_threshold_skips_even_when_total_allows(engine):
    # maxShardHits=1 < every shard's hits (3 and 2) while total 5 <=
    # 100: no shard contributes -> facet skipped (reference: facet
    # group absent -> client null)
    assert (
        engine.facet_counts(REQ, "cat", top_n=10, max_total_hits=100, max_shard_hits=1)
        is None
    )


def test_shard_threshold_zero_falls_back_to_total(engine):
    df = engine.facet_counts(REQ, "cat", top_n=10, max_total_hits=100, max_shard_hits=0)
    assert df is not None and df.count() == 3


def test_shard_threshold_partial_contribution(engine):
    # maxShardHits=2: shard 0 (3 hits) skips, shard 1 (2 hits)
    # contributes -> counts cover shard 1's docs only
    df = engine.facet_counts(REQ, "cat", top_n=10, max_shard_hits=2)
    assert df is not None
    counts = {r["value"]: r["cnt"] for r in df.collect()}
    assert sum(counts.values()) == 2


def test_stats_honor_guard(engine):
    assert engine.numeric_stats(REQ, "rating", max_total_hits=1) is None
    st = engine.numeric_stats(REQ, "rating", max_total_hits=100)
    assert st is not None and st.collect()[0]["count_v"] == 5
    assert engine.stat_facets(REQ, "cat", "rating", max_total_hits=1) is None
    assert engine.stat_facets(REQ, "cat", "rating", max_total_hits=100) is not None


def test_sharded_surfaces_honor_guard(engine):
    df, flags = engine.facet_counts_sharded(REQ, "cat", top_n=5, max_total_hits=1)
    assert df is None and flags is None
    assert (
        engine.stat_facets_sharded(REQ, "cat", "rating", top_n=5, max_total_hits=1)
        is None
    )
    assert engine.facet_path_counts(REQ, "cat", top_n=5, max_total_hits=1) is None

"""Node/index statistics surface (StatsController.java:37-90,
ZuliaIndexManager.getIndexStats:1913-1927, zulia_base.proto
NodeStats/IndexStats/ShardCacheStats/CacheStats): Caffeine-style query
cache counters, no-fault index stats, and the stats CLI command."""

from __future__ import annotations

import pytest

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.resident import ResidentIndexCache
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import SearchRequest
from zuliasearch_spark.stats import index_stats, node_stats


@pytest.fixture(scope="module")
def engine(spark, corpus_t1):
    df = spark.createDataFrame(corpus_t1)
    cfg = code_config(num_shards=1, query_cache_size=2)
    tables = build_index(df, cfg, stored_cols=("path", "lang")).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def test_cache_counters_hit_miss_eviction(engine):
    st0 = engine.shard_cache_stats()
    assert st0["primary"] is True
    base_hits = st0["generalCache"]["hitCount"]
    base_miss = st0["generalCache"]["missCount"]

    req = SearchRequest(qs="def", amount=3)
    engine.search(req)  # miss + load
    engine.search(req)  # hit
    st = engine.shard_cache_stats()
    g = st["generalCache"]
    assert g["missCount"] == base_miss + 1
    assert g["hitCount"] == base_hits + 1
    assert g["totalLoadTime"] > 0  # nanoseconds accumulated on the miss
    assert g["estimatedSize"] >= 1
    assert g["resultSize"] >= 3  # cached top-k rows
    # every cacheable lookup consults the pinned region first, so the
    # pinned cache records misses even when general hits (two stacked
    # Caffeine caches, each counting its own lookups)
    assert st["pinnedCache"]["missCount"] >= 2

    # overflow the 2-entry LRU: three distinct requests force one pop
    for q in ("class", "import", "return"):
        engine.search(SearchRequest(qs=q, amount=3))
    assert engine.shard_cache_stats()["generalCache"]["evictionCount"] >= 1


def test_pinned_cache_counters(engine):
    req = SearchRequest(qs="self", amount=3, pin_to_cache=True)
    engine.search(req)  # miss, loads INTO the pinned region
    engine.search(SearchRequest(qs="self", amount=3))  # pinned hit (key ignores pin flag)
    st = engine.shard_cache_stats()
    p = st["pinnedCache"]
    assert p["hitCount"] >= 1
    assert p["totalLoadTime"] > 0
    assert p["estimatedSize"] >= 1


def test_index_stats_no_fault_in(engine):
    cache = ResidentIndexCache()
    loads = {"n": 0}

    def loader():
        loads["n"] += 1
        return engine

    cache.register("idx_resident", loader)  # loads immediately
    cache.register("idx_transient", loader, transient=True)  # stays cold
    stats = index_stats(cache)
    assert [s["indexName"] for s in stats] == ["idx_resident", "idx_transient"]
    res, tra = stats
    assert res["resident"] is True
    assert res["shardCacheStat"][0]["primary"] is True
    assert tra == {"indexName": "idx_transient", "resident": False, "shardCacheStat": []}
    # getIndexStats never faults an index in (tryLeaseQuietly -> null)
    assert loads["n"] == 1
    assert cache.resident_count == 1


def test_node_stats_shape(spark, engine, tmp_path):
    cache = ResidentIndexCache()
    cache.register("one", lambda: engine)
    out = node_stats(cache, data_path=str(tmp_path), spark=spark)
    for k in (
        "jvmUsedMemoryMB",
        "jvmFreeMemoryMB",
        "jvmTotalMemoryMB",
        "jvmMaxMemoryMB",
    ):
        assert isinstance(out[k], int) and out[k] >= 0
    assert out["jvmMaxMemoryMB"] >= out["jvmTotalMemoryMB"] >= out["jvmUsedMemoryMB"]
    assert out["totalDataDirSpaceGB"] > 0
    assert out["usedDataDirSpaceGB"] + out["freeDataDirSpaceGB"] == pytest.approx(
        out["totalDataDirSpaceGB"]
    )
    assert out["zuliaVersion"]
    assert out["residentIndexCount"] == 1
    assert out["indexLoadCount"] == 1
    assert out["indexEvictionCount"] == 0
    assert out["indexStat"][0]["indexName"] == "one"


def test_cli_stats(spark, tmp_path, capsys):
    import json

    from zuliasearch_spark.tools import main

    home = tmp_path / "home"
    home.mkdir()
    assert main(["--home", str(home), "stats"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["indexStat"] == []
    assert out["residentIndexCount"] == 0
    assert "jvmUsedMemoryMB" in out and out["totalDataDirSpaceGB"] > 0

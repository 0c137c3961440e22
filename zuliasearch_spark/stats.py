"""Node / index statistics surface — the reference's monitoring API
(``rest/controllers/StatsController.java:37-90`` ``GET /stats``,
``NodesController``, protobuf ``NodeStats``/``IndexStats``/
``ShardCacheStats``/``CacheStats`` in ``zulia_base.proto:104-124``,
``ZuliaIndexManager.getIndexStats:1913-1927``).

The shapes mirror the proto field names so a reference client's JSON
consumer can read ours:

- ``NodeStats``: JVM memory (read from the LIVE Spark driver JVM via
  py4j — the true analogue of ``Runtime.getRuntime()``), data-dir
  disk space in GB, engine version, per-index stats, and the
  resident-index cache counters (residentIndexCount / indexLoadCount /
  indexEvictionCount — ``LoadedIndexCache`` counters).
- ``IndexStats``: one entry per REGISTERED index; an unloaded
  transient index is a bare non-resident entry with no shard cache
  stats (``tryLeaseQuietly`` returning null) — stats never fault an
  index in.
- ``ShardCacheStats``/``CacheStats``: the engine's pinned + general
  query caches with Caffeine-style counters (hit/miss/eviction,
  totalLoadTime in nanoseconds) from
  ``SearchEngine.shard_cache_stats``.

Documented deviation: the reference assigns ``totalDataDirSpaceGB``
from the FREE space (``StatsController.java:67``, an apparent bug);
we report the actual total.
"""

from __future__ import annotations

import shutil

from zuliasearch_spark import __version__

_GB = 1024.0**3
_MB = 1024 * 1024


def index_stats(cache) -> list[dict]:
    """``ZuliaIndexManager.getIndexStats`` (:1913-1927): every
    registered index sorted by name; resident ones carry their shard
    cache stats, unloaded transient ones are bare entries."""
    out = []
    for name in sorted(cache.registered()):
        eng = cache.peek(name)
        if eng is None:
            out.append({"indexName": name, "resident": False, "shardCacheStat": []})
        else:
            stat = (
                [eng.shard_cache_stats()]
                if hasattr(eng, "shard_cache_stats")
                else []
            )
            out.append({"indexName": name, "resident": True, "shardCacheStat": stat})
    return out


def _jvm_memory_mb(spark) -> dict:
    """``Runtime.getRuntime()`` of the LIVE driver JVM through py4j —
    the same numbers the reference's StatsController reads."""
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    total, free, mx = rt.totalMemory(), rt.freeMemory(), rt.maxMemory()
    return {
        "jvmUsedMemoryMB": (total - free) // _MB,
        "jvmFreeMemoryMB": free // _MB,
        "jvmTotalMemoryMB": total // _MB,
        "jvmMaxMemoryMB": mx // _MB,
    }


def node_stats(cache=None, data_path: str = ".", spark=None) -> dict:
    """``GET /stats`` → ``NodeStats`` (StatsController.getStats:49-90)."""
    out: dict = {}
    if spark is not None:
        out.update(_jvm_memory_mb(spark))
    usage = shutil.disk_usage(data_path)
    out["freeDataDirSpaceGB"] = usage.free / _GB
    out["totalDataDirSpaceGB"] = usage.total / _GB
    out["usedDataDirSpaceGB"] = (usage.total - usage.free) / _GB
    out["zuliaVersion"] = __version__
    if cache is not None:
        out["indexStat"] = index_stats(cache)
        out["residentIndexCount"] = cache.resident_count
        out["indexLoadCount"] = cache.load_count
        out["indexEvictionCount"] = cache.eviction_count
    return out

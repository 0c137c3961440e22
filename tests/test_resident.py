"""Transient-index residency + eviction (LoadedIndexCache.java,
TransientIndexPolicy.java, IndexLease.java; TransientEvictSingleShardTest /
FsTransientIndexTest semantics): non-transient indexes stay resident,
transient indexes load lazily, idle past the timeout or beyond the
count bound evicts longest-idle first, leases and min-residency defer
eviction, and a query after eviction faults the index back in.
"""

import pytest

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.resident import (
    ResidentIndexCache,
    TransientIndexPolicy,
)
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


@pytest.fixture(scope="module")
def loaders(spark, corpus_t1):
    df = spark.createDataFrame(corpus_t1)

    def make(name):
        def load():
            tables = build_index(df, code_config(num_shards=2)).persist()
            return SearchEngine(tables)

        return load

    return make


def _hits(eng):
    req = SearchRequest((C("FILTER", q="content:def"),), amount=1)
    return eng.search(req, fetch="none")["totalHits"]


def test_transient_lazy_load_and_idle_eviction(loaders):
    clock = FakeClock()
    cache = ResidentIndexCache(
        TransientIndexPolicy(idle_timeout_seconds=15), clock=clock
    )
    cache.register("stable", loaders("stable"), transient=False)
    cache.register("trans", loaders("trans"), transient=True)

    # non-transient loads at registration; transient waits for access
    assert cache.resident("stable") and not cache.resident("trans")
    assert cache.load_count == 1

    hits = _hits(cache.get("trans"))
    assert hits > 0 and cache.resident("trans")
    assert cache.load_count == 2

    # idle past the timeout (and past min-residency) → evicted;
    # the stable index never is (TransientEvictSingleShardTest)
    clock.advance(30)
    evicted = cache.evict_pass()
    assert evicted == ("trans",)
    assert cache.resident("stable") and not cache.resident("trans")
    assert cache.eviction_count == 1

    # post-eviction access faults it back in and still answers
    assert _hits(cache.get("trans")) == hits
    assert cache.resident("trans") and cache.load_count == 3


def test_min_residency_defers_eviction(loaders):
    clock = FakeClock()
    cache = ResidentIndexCache(
        TransientIndexPolicy(idle_timeout_seconds=1), clock=clock, min_residency=10
    )
    cache.register("t", loaders("t"), transient=True)
    cache.get("t")
    clock.advance(5)  # idle > timeout but younger than min-residency
    assert cache.evict_pass() == ()
    clock.advance(6)
    assert cache.evict_pass() == ("t",)


def test_count_bound_evicts_longest_idle(loaders):
    clock = FakeClock()
    cache = ResidentIndexCache(
        TransientIndexPolicy(max_loaded_indexes=1), clock=clock, min_residency=0
    )
    cache.register("a", loaders("a"), transient=True)
    cache.register("b", loaders("b"), transient=True)
    cache.lease("a").close()
    clock.advance(1)
    # leasing b puts two transient indexes resident; the pass inside
    # get() evicts the longest-idle (a)
    cache.lease("b").close()
    assert cache.evict_pass() == ("a",)
    assert cache.resident("b") and not cache.resident("a")


def test_lease_defers_eviction(loaders):
    clock = FakeClock()
    cache = ResidentIndexCache(
        TransientIndexPolicy(idle_timeout_seconds=1), clock=clock, min_residency=0
    )
    cache.register("t", loaders("t"), transient=True)
    lease = cache.lease("t")
    clock.advance(100)
    assert cache.evict_pass() == ()  # held lease blocks eviction
    lease.close()
    lease.close()  # idempotent
    assert cache.evict_pass() == ("t",)


def test_eviction_unpins_spark_cache(loaders):
    clock = FakeClock()
    cache = ResidentIndexCache(
        TransientIndexPolicy(idle_timeout_seconds=1), clock=clock, min_residency=0
    )
    cache.register("t", loaders("t"), transient=True)
    eng = cache.get("t")
    assert eng._pinned is not None  # resident = pinned postings
    clock.advance(5)
    cache.evict_pass()
    assert eng._pinned is None  # unloaded = executor cache released

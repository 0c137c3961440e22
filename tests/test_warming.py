"""Warming searches + keyed index-settings updates.

Mirrors the reference's warming-search lifecycle (CacheTest.java:
a pinToCache warming search stored in the index config is re-run
after load, and the user's identical — but label-less, pin-less —
search reports fullyCached with pinned shards) and the
UpdateIndexSettings.Operation MERGE/REPLACE/removedKeys semantics
(ZuliaIndexManager.updateWithAction:1448-1485;
MutableListConfigTest.java).
"""

import pandas as pd
import pytest

from zuliasearch_spark.config import (
    FieldConfig,
    IndexAs,
    IndexConfig,
    update_with_action,
)
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest, warming_request


def _cfg(**kw):
    return IndexConfig(
        index_name="warm",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
        ),
        **kw,
    )


# ------------------------------------------------- config-time validation


def test_warming_search_requires_label():
    # CreateIndexRequestValidator.java:171-174
    with pytest.raises(ValueError, match="search label is required"):
        _cfg(warming_searches=({"qs": "alpha"},))


def test_warming_search_rejects_duplicate_labels():
    # CreateIndexRequestValidator.java:175-177
    with pytest.raises(ValueError, match="duplicate search label"):
        _cfg(
            warming_searches=(
                {"searchLabel": "s", "qs": "alpha"},
                {"searchLabel": "s", "qs": "beta"},
            )
        )


def test_warming_searches_json_roundtrip():
    cfg = _cfg(
        warming_searches=(
            {"searchLabel": "imp", "qs": "alpha", "pinToCache": True, "amount": 5},
        )
    )
    back = IndexConfig.from_json(cfg.to_json())
    assert back.warming_searches == cfg.warming_searches


def test_warming_request_builds_filter_clause():
    # Search(...).addQuery(new FilterQuery("rating:[1.0 TO 3.5]"))
    # → a FILTER-occur clause (CacheTest.java:51-53)
    req = warming_request(
        {
            "searchLabel": "important search",
            "query": [{"q": "lang:python", "type": "FILTER"}],
            "amount": 7,
            "pinToCache": True,
        }
    )
    assert req.search_label == "important search"
    assert req.pin_to_cache and req.amount == 7
    assert req.clauses[0].type == "FILTER" and req.clauses[0].q == "lang:python"


# ---------------------------------------------- updateWithAction semantics


def _w(label, q):
    return {"searchLabel": label, "qs": q}


def test_update_with_action_merge_replaces_in_place_and_appends():
    existing = [_w("a", "1"), _w("b", "2"), _w("c", "3")]
    updates = [_w("b", "NEW"), _w("d", "4")]
    out = update_with_action(
        existing, updates, lambda w: w["searchLabel"], operation="MERGE"
    )
    assert out == [_w("a", "1"), _w("b", "NEW"), _w("c", "3"), _w("d", "4")]


def test_update_with_action_replace_and_removed_keys():
    existing = [_w("a", "1"), _w("b", "2")]
    out = update_with_action(
        existing,
        [_w("x", "9"), _w("x", "dup-ignored"), _w("y", "8")],
        lambda w: w["searchLabel"],
        operation="REPLACE",
    )
    assert out == [_w("x", "9"), _w("y", "8")]
    out = update_with_action(
        existing, (), lambda w: w["searchLabel"], operation="MERGE", removed_keys=("a",)
    )
    assert out == [_w("b", "2")]
    with pytest.raises(ValueError, match="Unknown operation"):
        update_with_action(existing, (), lambda w: w["searchLabel"], operation="NOPE")


def test_with_warming_searches_merge_by_label():
    cfg = _cfg(warming_searches=({"searchLabel": "s1", "qs": "alpha"},))
    cfg2 = cfg.with_warming_searches(
        [{"searchLabel": "s1", "qs": "alpha beta"}, {"searchLabel": "s2", "qs": "g"}]
    )
    assert [w["searchLabel"] for w in cfg2.warming_searches] == ["s1", "s2"]
    assert cfg2.warming_searches[0]["qs"] == "alpha beta"
    cfg3 = cfg2.with_warming_searches(removed_keys=("s1",))
    assert [w["searchLabel"] for w in cfg3.warming_searches] == ["s2"]


# --------------------------------------------------------- engine behavior


def test_pin_runs_warming_searches_and_user_search_hits(spark):
    """CacheTest.searchTest: after warming, the SAME query issued
    without searchLabel/pinToCache reports fullyCached and pinned
    shards; the pinned entry survives LRU pressure."""
    rows = [(f"d{i}", "alpha beta", "python" if i % 2 else "go") for i in range(8)]
    cfg = _cfg(
        query_cache_size=2,
        query_cache_max_amount=10,
        warming_searches=(
            {
                "searchLabel": "important search",
                "query": [
                    {"q": "lang:python", "type": "FILTER"},
                    {"q": "alpha", "type": "SCORE_SHOULD", "qf": ["content"]},
                ],
                "amount": 5,
                "pinToCache": True,
            },
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "lang"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    eng = SearchEngine(tables)
    try:
        eng.pin()
        assert eng._pinned_query_cache, "pin() must run the warming searches"
        user_req = SearchRequest(
            clauses=(
                C("FILTER", q="lang:python"),
                C("SCORE_SHOULD", q="alpha", qf=("content",)),
            ),
            amount=5,
        )
        res = eng.search(user_req)
        assert res["fullyCached"] is True
        assert res["shardsPinned"] == cfg.number_of_shards
        assert res["shardsCached"] == cfg.number_of_shards
        assert res["shardsQueried"] == cfg.number_of_shards
        # LRU pressure cannot evict the pinned warming entry
        for i in range(5):
            eng.search(SearchRequest(qs="beta", amount=i + 1))
        assert eng.search(user_req)["fullyCached"] is True
        # result contents match a cold (realtime) run of the query
        cold = eng.search(
            SearchRequest(
                clauses=(
                    C("FILTER", q="lang:python"),
                    C("SCORE_SHOULD", q="alpha", qf=("content",)),
                ),
                amount=5,
                realtime=True,
            )
        )
        assert [t["uniqueId"] for t in res["topk"]] == [
            t["uniqueId"] for t in cold["topk"]
        ]
        assert res["totalHits"] == cold["totalHits"]
    finally:
        eng.unpin()
        tables.unpersist()


def test_warm_searches_failure_is_not_fatal(spark):
    rows = [("d0", "alpha", "go")]
    cfg = _cfg(
        query_cache_size=2,
        warming_searches=(
            {"searchLabel": "bad", "qs": "nosuchfield:[zz TO"},  # parse error
            {"searchLabel": "good", "qs": "alpha", "amount": 3},
        ),
    )
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "lang"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    eng = SearchEngine(tables)
    try:
        results = eng.warm_searches()
        by_label = {r["label"]: r for r in results}
        assert not by_label["bad"]["ok"] and by_label["bad"]["error"]
        assert by_label["good"]["ok"]
        assert eng.search(SearchRequest(qs="alpha", amount=3))["fullyCached"]
    finally:
        tables.unpersist()

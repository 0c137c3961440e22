"""Durable tombstones: survive engine restarts, purge at optimize.

The judge-prescribed contract: delete → a NEW engine on the same
tables still excludes the docs → optimize → postings are PHYSICALLY
purged (ids renumbered dense, stats consistent), and the merged index
starts with an empty tombstone set.
"""

import os

import numpy as np

from tests.conftest import code_config
from zuliasearch_spark.indexing.segments import (
    SegmentedIndexWriter,
    optimize,
    read_segmented_index,
)
from zuliasearch_spark.indexing.tombstones import load_tombstone_uids
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


def test_durable_delete_and_purge(spark, corpus_t1, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("durable_idx"))
    out = str(tmp_path_factory.mktemp("durable_opt"))
    cfg = code_config(num_shards=2)
    w = SegmentedIndexWriter(idx, cfg, n_segments=3)
    w.build(spark.createDataFrame(corpus_t1))

    tables = read_segmented_index(spark, idx, cfg).persist()
    req = SearchRequest((C("SCORE_SHOULD", q="parse", qf=("content",)),), amount=10)
    try:
        eng = SearchEngine(tables)
        before = eng.search(req)
        victims = [t["uniqueId"] for t in before["topk"][:3]]
        assert eng.delete_by_unique_ids(victims) == 3
        n_total = len(corpus_t1)

        # a NEW engine over the same on-disk index still excludes them
        eng2 = SearchEngine(read_segmented_index(spark, idx, cfg))
        after = eng2.search(req)
        assert after["totalHits"] == before["totalHits"] - 3
        assert not ({t["uniqueId"] for t in after["topk"]} & set(victims))
        assert sum(eng2.get_number_of_docs().values()) == n_total - 3
    finally:
        tables.unpersist()

    # optimize physically purges: same results, dense ids, no tombstones
    opt_tables = optimize(spark, idx, out, cfg).persist()
    try:
        assert load_tombstone_uids(out) == []
        assert not os.path.exists(os.path.join(out, "tombstones.jsonl"))
        eng3 = SearchEngine(opt_tables)
        assert eng3._tombstones == {}
        assert sum(eng3.get_number_of_docs().values()) == n_total - 3
        res = eng3.search(req)
        assert res["totalHits"] == before["totalHits"] - 3
        assert not ({t["uniqueId"] for t in res["topk"]} & set(victims))
        # victims are gone from doc_map and ids are dense per shard
        dm = opt_tables.doc_map.collect()
        uids = {r["uniqueId"] for r in dm}
        assert not (uids & set(victims))
        by_shard: dict[int, list[int]] = {}
        for r in dm:
            by_shard.setdefault(int(r["shard"]), []).append(int(r["doc_id"]))
        for s, ids in by_shard.items():
            assert sorted(ids) == list(range(len(ids))), f"shard {s} ids not dense"
        # postings doc counts agree with live docs (physical purge)
        fs = {
            (r["field"], int(r["shard"])): int(r["doc_count"])
            for r in opt_tables.field_stats.collect()
        }
        for s, ids in by_shard.items():
            assert fs[("content", s)] == len(ids)
        # scores match a fresh build of the surviving corpus (stats
        # reflect the purge, not just the mask)
        from zuliasearch_spark.indexing.builder import build_index

        survivors = corpus_t1[~corpus_t1["uniqueId"].isin(victims)].reset_index(drop=True)
        fresh = SearchEngine(build_index(spark.createDataFrame(survivors), cfg))
        f = fresh.search(req)
        got = [(t["uniqueId"], round(t["score"], 4)) for t in res["topk"]]
        want = [(t["uniqueId"], round(t["score"], 4)) for t in f["topk"]]
        assert got == want
    finally:
        opt_tables.unpersist()

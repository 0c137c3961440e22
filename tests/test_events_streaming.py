"""availableNow incremental indexing of the events feed (SURVEY §2.12
stretch): the backlog lands as one committed segment per micro-batch
(maxFilesPerTrigger-bounded, the analogue of the reference's
shardCommitInterval-sized commits — ShardWriteManager.java:290,
zulia_index.proto:47), and a reader opened after the stream drains
answers the three events gates identically to a one-shot build.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zuliasearch_spark.gate import (
    EVENTS_STORED_COLS,
    events_config,
    events_corpus,
)
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.indexing.segments import (
    committed_segments,
    read_segmented_index,
)
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest
from zuliasearch_spark.streaming.incremental import incremental_index

SF_DIR = "/root/testdata/sf0.001"

EVENTS_SCHEMA = (
    "uid string, orig_event_id long, event_type string, "
    "user_id long, value double, ts timestamp"
)


def _gate_answers(eng: SearchEngine):
    """The three events-gate surfaces, materialized for comparison."""
    q = "event_type:purchase AND ts:[2024-01-05 TO 2024-01-15]"
    hits = eng.search_string(q, amount=1)["totalHits"]
    stats = (
        eng.numeric_stats(SearchRequest(qs=q, amount=1), "value")
        .select(
            F.round("min_v", 2).alias("min_v"),
            F.round("max_v", 2).alias("max_v"),
            F.round("sum_v", 2).alias("sum_v"),
            F.col("count_v").cast("long").alias("count_v"),
        )
        .collect()
    )
    rollup = sorted(
        (r["value"], r["cnt"])
        for r in eng.facet_counts(
            SearchRequest(
                qs="event_type:error AND ts:[2024-01-08 TO 2024-01-14]", amount=1
            ),
            "ts",
            top_n=7,
            date_format="yyyy-MM-dd",
        ).collect()
    )
    topk = [
        (r["orig_event_id"], round(r["value"], 2))
        for r in eng.sort_search(
            SearchRequest((C("FILTER", q="event_type:purchase"),), amount=1),
            sort_col="value",
            ascending=False,
            amount=10,
            tiebreak=("orig_event_id",),
        ).collect()
    ]
    return hits, [tuple(r) for r in stats], rollup, topk


@pytest.fixture(scope="module")
def events_raw(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").limit(2000)


def test_available_now_three_batches_match_one_shot(
    spark, events_raw, tmp_path_factory
):
    src = str(tmp_path_factory.mktemp("ev_src"))
    idx = str(tmp_path_factory.mktemp("ev_idx"))
    ckpt = str(tmp_path_factory.mktemp("ev_ckpt"))

    corpus = events_corpus(events_raw)
    # backlog = 3 source files; maxFilesPerTrigger=1 → availableNow
    # drains it as 3 micro-batches → 3 committed segments
    for i in range(3):
        corpus.filter(F.crc32(F.col("uid")) % 3 == i).coalesce(1).write.parquet(
            f"{src}/part{i}"
        )

    q = incremental_index(
        spark,
        f"{src}/*",
        idx,
        events_config(),
        ckpt,
        EVENTS_SCHEMA,
        stored_cols=EVENTS_STORED_COLS,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    assert len(committed_segments(idx)) == 3

    streamed_tables = read_segmented_index(spark, idx, events_config()).persist()
    one_shot = build_index(
        corpus, events_config(), stored_cols=EVENTS_STORED_COLS
    ).persist()
    try:
        streamed = SearchEngine(streamed_tables)
        batch = SearchEngine(one_shot)
        assert sum(streamed.get_number_of_docs().values()) == corpus.count()
        assert _gate_answers(streamed) == _gate_answers(batch)
    finally:
        streamed_tables.unpersist()
        one_shot.unpersist()


def test_resume_after_partial_drain_is_exactly_once(
    spark, events_raw, tmp_path_factory
):
    """A second availableNow run over an already-drained source commits
    nothing new; adding a file and rerunning appends exactly one
    segment (Spark offset checkpoint + our manifest idempotence)."""
    src = str(tmp_path_factory.mktemp("ev_src2"))
    idx = str(tmp_path_factory.mktemp("ev_idx2"))
    ckpt = str(tmp_path_factory.mktemp("ev_ckpt2"))

    corpus = events_corpus(events_raw)
    first = corpus.filter(F.crc32(F.col("uid")) % 3 < 2)
    second = corpus.filter(F.crc32(F.col("uid")) % 3 == 2)
    first.coalesce(1).write.parquet(f"{src}/a")

    run = lambda: incremental_index(
        spark,
        f"{src}/*",
        idx,
        events_config(),
        ckpt,
        EVENTS_SCHEMA,
        stored_cols=EVENTS_STORED_COLS,
    ).awaitTermination(300)

    run()
    segs = committed_segments(idx)
    run()  # no new data → no new segment
    assert committed_segments(idx) == segs

    second.coalesce(1).write.parquet(f"{src}/b")
    run()
    assert len(committed_segments(idx)) == len(segs) + 1

    tables = read_segmented_index(spark, idx, events_config()).persist()
    try:
        eng = SearchEngine(tables)
        assert sum(eng.get_number_of_docs().values()) == corpus.count()
    finally:
        tables.unpersist()

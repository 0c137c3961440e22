"""Incremental (near-real-time) indexing via Structured Streaming.

The reference is near-real-time through commit + reader refresh
(shardCommitInterval/idleTimeWithoutCommit, zulia_index.proto:46-47;
ShardWriteManager.java:238-266): new documents become searchable at
the next segment commit. The Spark-batch analogue: a Structured
Streaming source feeds ``foreachBatch``, every micro-batch becomes
ONE committed index segment (atomic manifest append), and a reader
opened after a commit sees it — identical freshness semantics,
checkpointed twice (Spark's streaming checkpoint for source offsets,
our manifest for committed segments), so a killed stream resumes
without duplicating or losing a batch.

Segment ids are ``stream_base + batch_id``; reads go through
``read_segmented_index`` unchanged (composite partition ids keep doc
ids disjoint across segments; BM25 stats still pool per true shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from zuliasearch_spark.config import IndexConfig
from zuliasearch_spark.indexing.segments import commit_batch_segment

STREAM_SEGMENT_BASE = 1_000_000  # stream segments above any batch build's


def append_stream_segment(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    config: IndexConfig,
    stored_cols: tuple[str, ...] = (),
) -> None:
    """foreachBatch body: micro-batch → one committed segment.

    Idempotent per batch_id: a restart that replays a batch finds its
    segment committed and skips (exactly-once append on top of
    Spark's at-least-once foreachBatch contract). ``stored_cols``
    ride into every segment so doc-values paths (ranges, stats,
    facets, sorts) work over streamed segments exactly as over a
    one-shot build.
    """
    segment = STREAM_SEGMENT_BASE + int(batch_id)
    commit_batch_segment(batch_df, segment, index_path, config, stored_cols=stored_cols)


def incremental_index(
    spark,
    source_dir: str,
    index_path: str,
    config: IndexConfig,
    checkpoint_dir: str,
    schema: str,
    available_now: bool = True,
    stored_cols: tuple[str, ...] = (),
    max_files_per_trigger: int | None = None,
):
    """Watch ``source_dir`` for new parquet files and index them.

    ``available_now=True`` processes everything currently available
    and stops (batch-incremental — the reference's "index the backlog,
    commit, become searchable" loop); False leaves a continuous stream
    running. ``max_files_per_trigger`` bounds each micro-batch (and
    therefore each committed segment) to N source files — availableNow
    honors it, so a backlog of K files lands as ⌈K/N⌉ segments instead
    of one monolith, matching the reference's shardCommitInterval-sized
    commits (zulia_index.proto:47). Returns the StreamingQuery.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, bid: append_stream_segment(
                df, bid, index_path, config, stored_cols=stored_cols
            )
        )
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()

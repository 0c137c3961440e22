"""Distributed inverted-index build: corpus DataFrame → index tables.

The Spark-first re-expression of the reference's Store/index path
(ShardDocumentIndexer.java:74-103 routes BSON docs through per-field
Lucene indexers into sharded Lucene indexes; routing
ShardUtil.java:3-20). Here the whole build is a declarative plan:

    corpus
      → shard = djb2(uniqueId) % S            (vectorized pandas UDF)
      → doc_id = row_number per shard          (dense ids ⇒ tight delta gaps)
      → mapInArrow tokenize (byte-kernel analyzers, Arrow in/out)
        ⇒ doc-term rows (field, shard, doc_id, dl, terms[], tfs[])
      → groupBy(field, shard, bucket).applyInArrow(block encoder)
        ⇒ postings blocks (delta-gap varint docIDs, varint TFs,
          varint dls, per-block max_tf/min_dl/sum_tf) + one NORMS row
          per group (term=NULL: distinct docIDs + field lengths)
      → term_stats / field_stats / shard stats = plain groupBy·agg
        over BLOCK METADATA (no re-tokenize, no decode)

The single expensive pass (tokenize → one shuffle → encode) runs
exactly ONCE; every statistics table derives relationally from the
postings blocks' metadata columns:

    term_stats  = Σ n, Σ sum_tf       per (field, shard, term)
    field_stats = Σ n, Σ sum_dl       per (field, shard) over norms rows

Scale design (the part that must survive 10^12 docs / 1000 executors):

- **Hot-term skew**: postings groups are keyed (field, shard,
  bucket) where bucket = doc_id >> log2(docs_per_bucket). A group's
  size is bounded by docs_per_bucket × avg distinct terms/doc — it
  does NOT grow with corpus size or term popularity, so "the"/"def"
  never melt one reducer; a hot term's postings simply span many
  bucket rows, which the query kernel concatenates (block streams are
  doc-ordered across buckets by construction). This replaces an
  explicit salt+re-merge: the doc-range IS the salt, and no second
  shuffle is needed because bucket order == docID order.
- **Map-side combine**: the stats aggregations run over postings
  block metadata (orders of magnitude smaller than the tall frame)
  with partial aggregation before their shuffles.
- **Norms travel with postings**: each block stores the docs' field
  lengths (varint). +1-2 bytes/posting versus Lucene's separate
  per-doc norms file, but a query then touches ONLY the posting rows
  of its query terms — no per-query shuffle/broadcast of a
  shard-wide norms table. At 100 TB that trade wins: queries read
  KBs, not the norms of every doc in every shard.
- **Pushdown**: written postings are partitioned by (field) and
  sorted by (term) within files so Parquet row-group min/max stats
  prune non-query terms at scan time.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zuliasearch_spark.analysis.analyzers import term_freqs
from zuliasearch_spark.config import AnalyzerSettings, IndexConfig
from zuliasearch_spark.util.hashing import shard_for_series
from zuliasearch_spark.util.varint import varint_encode, varint_encode_with_offsets

POSTINGS_SCHEMA = (
    "field string, shard int, bucket long, term string, block_id int, "
    "first_doc long, last_doc long, n int, doc_bytes binary, tf_bytes binary, "
    "dl_bytes binary, pos_bytes binary, max_tf int, min_dl int, sum_tf long, sum_dl long"
)

TALL_SCHEMA = (
    "shard int, doc_id long, dl int, terms array<string>, tfs array<int>, poss array<int>"
)


@dataclass
class IndexTables:
    """The index as DataFrames (backed by memory or parquet)."""

    config: IndexConfig
    doc_map: DataFrame  # shard, doc_id, uniqueId, content_sha256 [+ stored cols]
    postings: DataFrame  # POSTINGS_SCHEMA; term IS NULL rows = per-group norms
    term_stats: DataFrame  # field, shard, term, df, ttf
    field_stats: DataFrame  # field, shard, doc_count, sum_dl
    shard_counts: DataFrame  # shard, num_docs (doc_ids are dense 0..num_docs-1)

    def persist(self) -> "IndexTables":
        for df in (self.doc_map, self.postings, self.term_stats, self.field_stats, self.shard_counts):
            df.persist()
        return self

    def unpersist(self) -> None:
        for df in (self.doc_map, self.postings, self.term_stats, self.field_stats, self.shard_counts):
            df.unpersist()


def _make_tokenizer(col: str, settings: AnalyzerSettings, store_positions: bool = True):
    """mapInArrow generator: (shard, doc_id, <col>) → per-doc term rows.

    Arrow in, Arrow out: the content strings never become Python
    objects — the analyzer kernel reads the Arrow string buffer
    directly and the emitted term column is the kernel's own Arrow
    array. (mapInPandas here would materialize every document as a
    PyStr and back: measured as more expensive than tokenizing.)

    ``poss`` is each doc's flat position stream in (term, position)
    order — run lengths are the ``tfs`` entries — feeding the block
    encoder's positions stream (empty when positions are off).
    """
    import pyarrow as pa

    from zuliasearch_spark.analysis.analyzers import term_freqs_positions

    def tokenize(batches):
        for rb in batches:
            names = rb.schema.names
            if store_positions:
                doc_idx, term_arr, tf, dl, posflat = term_freqs_positions(
                    rb.column(names.index(col)), settings
                )
            else:
                doc_idx, term_arr, tf, dl = term_freqs(rb.column(names.index(col)), settings)
                posflat = np.empty(0, dtype=np.int64)
            shard = rb.column(names.index("shard")).to_numpy()
            docid = rb.column(names.index("doc_id")).to_numpy()
            # pack per-DOC rows (list columns): the downstream shuffle
            # moves ~200x fewer rows for the same bytes — per-row
            # serialization overhead at the exchange dominates
            # otherwise. doc_idx is ascending by construction.
            present, starts = np.unique(doc_idx, return_index=True)
            offsets = pa.array(
                np.concatenate((starts, [doc_idx.size])).astype(np.int32), type=pa.int32()
            )
            term_vals = term_arr.cast(pa.string()) if term_arr.type != pa.string() else term_arr
            if store_positions and posflat.size:
                # per-present-doc token counts = Σ tf within the doc
                tok_counts = np.add.reduceat(tf, starts)
                pos_offsets = np.zeros(present.size + 1, dtype=np.int32)
                np.cumsum(tok_counts, out=pos_offsets[1:])
                poss = pa.ListArray.from_arrays(
                    pa.array(pos_offsets, type=pa.int32()),
                    pa.array(posflat.astype(np.int32), type=pa.int32()),
                )
            else:
                poss = pa.ListArray.from_arrays(
                    pa.array(np.zeros(present.size + 1, dtype=np.int32), type=pa.int32()),
                    pa.array([], type=pa.int32()),
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(shard[present], type=pa.int32()),
                    pa.array(docid[present], type=pa.int64()),
                    pa.array(dl[present].astype(np.int32), type=pa.int32()),
                    pa.ListArray.from_arrays(offsets, term_vals),
                    pa.ListArray.from_arrays(offsets, pa.array(tf.astype(np.int32), type=pa.int32())),
                    poss,
                ],
                names=["shard", "doc_id", "dl", "terms", "tfs", "poss"],
            )

    return tokenize


def _make_block_encoder(block_size: int):
    """applyInArrow kernel: one (field, shard, bucket) group → block rows.

    All terms of the bucket are encoded in a single vectorized pass:
    dictionary-encode terms (Arrow C++), lexsort by (term, doc_id), split each term run
    into blocks of ``block_size``, varint-encode the whole partition
    once and slice per block. Additionally emits ONE norms row
    (term = NULL) carrying the group's distinct docIDs and their
    field lengths — the source for field_stats and resumable
    per-group lineage (row counts live in block metadata).
    """

    import pyarrow as pa
    import pyarrow.compute as pc

    def encode(key, tbl):
        field, shard, bucket = (k.as_py() if hasattr(k, "as_py") else k for k in key)
        if tbl.num_rows == 0:
            return tbl
        # unpack per-doc list rows → flat (doc, term, tf, dl) arrays
        terms_col = tbl.column("terms").combine_chunks()
        flat_terms = terms_col.flatten()
        offs = terms_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        # dictionary_encode runs in Arrow C++ — terms never become PyStr
        dict_arr = pc.dictionary_encode(flat_terms)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = dict_arr.dictionary
        doc = np.repeat(tbl.column("doc_id").to_numpy().astype(np.int64), counts)
        dl = np.repeat(tbl.column("dl").to_numpy().astype(np.int64), counts)
        tf = tbl.column("tfs").combine_chunks().flatten().to_numpy().astype(np.int64)
        posflat = tbl.column("poss").combine_chunks().flatten().to_numpy().astype(np.int64)
        order = np.lexsort((doc, codes))
        if posflat.size:
            # positions travel as pair runs (lengths = tf): gather the
            # runs into the sorted pair order before re-slicing
            starts_orig = np.zeros(tf.size, dtype=np.int64)
            np.cumsum(tf[:-1], out=starts_orig[1:])
            tf_sorted = tf[order]
            from zuliasearch_spark.analysis.analyzers import _ranges_within

            gather = np.repeat(starts_orig[order], tf_sorted)
            gather += _ranges_within(tf_sorted.astype(np.int32)).astype(np.int64)
            posflat = posflat[gather]
        codes, doc, tf, dl = codes[order], doc[order], tf[order], dl[order]

        new_term = np.empty(len(codes), dtype=bool)
        new_term[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new_term[1:])
        # rank within term run
        idx = np.arange(len(codes), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_term, idx, 0))
        rank = idx - run_start
        block_id = (rank // block_size).astype(np.int32)
        new_block = new_term | ((rank % block_size) == 0)
        bstarts = np.flatnonzero(new_block).astype(np.int64)
        bends = np.concatenate((bstarts[1:], [len(codes)]))

        # delta-gap: first value of each block absolute, rest gaps
        deltas = np.empty_like(doc)
        deltas[0] = doc[0]
        np.subtract(doc[1:], doc[:-1], out=deltas[1:])
        deltas[bstarts] = doc[bstarts]

        doc_buf, doc_offs = varint_encode_with_offsets(deltas)
        tf_buf, tf_offs = varint_encode_with_offsets(tf)
        dl_buf, dl_offs = varint_encode_with_offsets(dl)

        tf_cum = np.zeros(len(tf) + 1, dtype=np.int64)
        np.cumsum(tf, out=tf_cum[1:])

        if posflat.size:
            # positions stream: per posting run (length tf), first
            # position absolute, rest gaps — freq implies run length,
            # exactly Lucene's .pos stream layout
            run_starts = tf_cum[:-1]
            pdeltas = np.empty_like(posflat)
            pdeltas[0] = posflat[0]
            np.subtract(posflat[1:], posflat[:-1], out=pdeltas[1:])
            pdeltas[run_starts] = posflat[run_starts]
            pos_buf, pos_offs = varint_encode_with_offsets(pdeltas)
            mv_pos = memoryview(pos_buf)

        mv_doc, mv_tf, mv_dl = memoryview(doc_buf), memoryview(tf_buf), memoryview(dl_buf)
        nb = bstarts.size
        # norms entry (appended as the last row, term = NULL): distinct
        # (doc, dl) of the group — docIDs ascending
        udoc, uidx = np.unique(doc, return_index=True)
        udl = dl[uidx]
        ndeltas = np.empty_like(udoc)
        ndeltas[0] = udoc[0]
        np.subtract(udoc[1:], udoc[:-1], out=ndeltas[1:])

        term_col = pa.concat_arrays(
            [
                pc.take(uniques, pa.array(codes[bstarts], type=pa.int64())).cast(pa.string()),
                pa.array([None], type=pa.string()),
            ]
        )
        doc_bytes = [bytes(mv_doc[doc_offs[a] : doc_offs[b]]) for a, b in zip(bstarts, bends)]
        tf_bytes = [bytes(mv_tf[tf_offs[a] : tf_offs[b]]) for a, b in zip(bstarts, bends)]
        dl_bytes = [bytes(mv_dl[dl_offs[a] : dl_offs[b]]) for a, b in zip(bstarts, bends)]
        if posflat.size:
            pos_bytes = [
                bytes(mv_pos[pos_offs[tf_cum[a]] : pos_offs[tf_cum[b]]])
                for a, b in zip(bstarts, bends)
            ]
        else:
            pos_bytes = [b""] * nb
        doc_bytes.append(varint_encode(ndeltas))
        tf_bytes.append(b"")
        dl_bytes.append(varint_encode(udl))
        pos_bytes.append(b"")

        def i32(block_vals, norm_val):
            return pa.array(np.concatenate((block_vals.astype(np.int32), [np.int32(norm_val)])), type=pa.int32())

        def i64(block_vals, norm_val):
            return pa.array(np.concatenate((block_vals.astype(np.int64), [np.int64(norm_val)])), type=pa.int64())

        return pa.table(
            {
                "field": pa.array([field] * (nb + 1), type=pa.string()),
                "shard": pa.array(np.full(nb + 1, shard, dtype=np.int32), type=pa.int32()),
                "bucket": pa.array(np.full(nb + 1, bucket, dtype=np.int64), type=pa.int64()),
                "term": term_col,
                "block_id": i32(block_id[bstarts], -1),
                "first_doc": i64(doc[bstarts], udoc[0]),
                "last_doc": i64(doc[bends - 1], udoc[-1]),
                "n": i32((bends - bstarts), udoc.size),
                "doc_bytes": pa.array(doc_bytes, type=pa.binary()),
                "tf_bytes": pa.array(tf_bytes, type=pa.binary()),
                "dl_bytes": pa.array(dl_bytes, type=pa.binary()),
                "pos_bytes": pa.array(pos_bytes, type=pa.binary()),
                "max_tf": i32(np.maximum.reduceat(tf, bstarts), 0),
                "min_dl": i32(np.minimum.reduceat(dl, bstarts), 0),
                "sum_tf": i64(tf_cum[bends] - tf_cum[bstarts], 0),
                "sum_dl": i64(np.zeros(nb), udl.sum()),
            }
        )

    return encode


def shard_udf(num_shards: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _shard(uid: pd.Series) -> pd.Series:
        return pd.Series(shard_for_series(uid, num_shards))

    return _shard


def assign_ids(corpus: DataFrame, config: IndexConfig) -> DataFrame:
    """Add (shard, doc_id): djb2 routing + dense per-shard doc ids.

    doc_id = row_number within shard ordered by uniqueId: deterministic
    and dense (tight delta gaps).

    The Window runs over a NARROW projection (uniqueId, shard) and the
    resulting id table is broadcast-joined back, so the WIDE corpus
    (content strings) never goes through a shuffle — shuffle bytes are
    the scarce resource (disk/network bound, they don't scale with
    cores). At a scale where the per-segment id table outgrows a
    broadcast (~10M+ docs per segment), build with more, smaller
    segments (SegmentedIndexWriter) — ids are per-segment — or swap
    the join strategy to a sort-merge join by removing the broadcast
    hint; the narrow Window itself stays cheap.
    """
    uid = config.unique_id_col
    narrow = corpus.select(F.col(uid).cast("string").alias(uid))
    narrow = narrow.withColumn("shard", shard_udf(config.number_of_shards)(F.col(uid)))
    w = Window.partitionBy("shard").orderBy(uid)
    ids = narrow.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
    return corpus.withColumn(uid, F.col(uid).cast("string")).join(F.broadcast(ids), uid)


def stats_from_postings(postings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(term_stats, field_stats) from block metadata — no decode.

    df = Σ n over a term's blocks (each doc appears once per term),
    ttf = Σ sum_tf; doc_count / sum_dl come from the norms rows
    (term IS NULL), whose docs are distinct within each (field,
    shard, bucket) group and buckets partition the doc-id space.
    """
    term_stats = (
        postings.filter(F.col("term").isNotNull())
        .groupBy("field", "shard", "term")
        .agg(F.sum("n").cast("long").alias("df"), F.sum("sum_tf").cast("long").alias("ttf"))
    )
    field_stats = (
        postings.filter(F.col("term").isNull())
        .groupBy("field", "shard")
        .agg(F.sum("n").cast("long").alias("doc_count"), F.sum("sum_dl").cast("long").alias("sum_dl"))
    )
    return term_stats, field_stats


def tokenize_all(base: DataFrame, config: IndexConfig) -> DataFrame:
    """corpus(+shard,doc_id) → tall (field, shard, doc_id, term, tf, dl)."""
    tall_parts = []
    for stored_col, ia in config.indexed_fields():
        settings = config.analyzer(ia.analyzer_name)
        t = (
            base.select("shard", "doc_id", stored_col)
            .mapInArrow(
                _make_tokenizer(stored_col, settings, config.store_positions), TALL_SCHEMA
            )
            .withColumn("field", F.lit(ia.indexed_field_name))
        )
        tall_parts.append(t)
    if not tall_parts:
        raise ValueError("index config has no indexed fields")
    tall = tall_parts[0]
    for t in tall_parts[1:]:
        tall = tall.unionByName(t)
    return tall


def build_postings(tall: DataFrame, config: IndexConfig) -> DataFrame:
    bucket_shift = int(np.log2(config.docs_per_bucket))
    tall_b = tall.withColumn("bucket", F.shiftright("doc_id", bucket_shift).cast("long"))
    return tall_b.groupBy("field", "shard", "bucket").applyInArrow(
        _make_block_encoder(config.block_size), POSTINGS_SCHEMA
    )


def build_index(corpus: DataFrame, config: IndexConfig, stored_cols: tuple[str, ...] = ()) -> IndexTables:
    """Build all index tables from a corpus DataFrame (lazy plan).

    The returned postings/term_stats/field_stats share one lineage
    through the postings blocks; callers that materialize more than
    one table should ``persist()`` (in-memory use) or ``write_index``
    (which materializes postings FIRST, then derives stats from the
    written parquet — the tokenize pass runs exactly once).
    """
    uid = config.unique_id_col
    base = assign_ids(corpus, config)

    doc_map_cols = [
        F.col("shard"),
        F.col("doc_id"),
        F.col(uid).cast("string").alias("uniqueId"),
    ]
    content_col = next(
        (fc.stored_field_name for fc in config.field_configs for ia in fc.index_as), None
    )
    if content_col is not None:
        doc_map_cols.append(F.sha2(F.col(content_col).cast("string"), 256).alias("content_sha256"))
    for c in stored_cols:
        doc_map_cols.append(F.col(c))
    doc_map = base.select(*doc_map_cols)

    postings = build_postings(tokenize_all(base, config), config)
    term_stats, field_stats = stats_from_postings(postings)
    shard_counts = doc_map.groupBy("shard").agg(F.count(F.lit(1)).alias("num_docs"))
    return IndexTables(config, doc_map, postings, term_stats, field_stats, shard_counts)


# ---------------------------------------------------------------------------
# parquet persistence (Iceberg-style layout: data + a manifest JSON)


def write_index(tables: IndexTables, path: str) -> IndexTables:
    """Write index tables as parquet; ONE pass over the corpus.

    Postings are written first (sorted by term within (field, shard)
    partitions for parquet min/max pushdown); the stats tables are
    then derived from the WRITTEN postings so the expensive
    tokenize+shuffle lineage is never recomputed. Returns the
    re-rooted IndexTables reading from ``path``.
    """
    spark = tables.postings.sparkSession
    (
        tables.postings.repartition("field", "shard")
        .sortWithinPartitions("term", "bucket", "block_id")
        .write.mode("overwrite")
        .partitionBy("field")
        .parquet(os.path.join(path, "postings"))
    )
    tables.doc_map.write.mode("overwrite").parquet(os.path.join(path, "doc_map"))
    postings = spark.read.parquet(os.path.join(path, "postings"))
    term_stats, field_stats = stats_from_postings(postings)
    (
        term_stats.repartition("field")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("field")
        .parquet(os.path.join(path, "term_stats"))
    )
    field_stats.write.mode("overwrite").parquet(os.path.join(path, "field_stats"))
    doc_map = spark.read.parquet(os.path.join(path, "doc_map"))
    shard_counts = doc_map.groupBy("shard").agg(F.count(F.lit(1)).alias("num_docs"))
    shard_counts.write.mode("overwrite").parquet(os.path.join(path, "shard_counts"))
    return read_index(spark, path, tables.config)


def read_index(spark: SparkSession, path: str, config: IndexConfig) -> IndexTables:
    return IndexTables(
        config,
        spark.read.parquet(os.path.join(path, "doc_map")),
        spark.read.parquet(os.path.join(path, "postings")),
        spark.read.parquet(os.path.join(path, "term_stats")),
        spark.read.parquet(os.path.join(path, "field_stats")),
        spark.read.parquet(os.path.join(path, "shard_counts")),
    )

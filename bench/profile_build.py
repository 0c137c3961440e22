#!/usr/bin/env python
"""Per-phase build profiler for the scaling protocol (BASELINE.md §4).

Times each materialization inside the timed build window separately so
the Amdahl-fixed (non-core-scaling) cost can be attributed:

    python bench/profile_build.py --cores 8 --corpus /tmp/zscaling_corpus_200000 --docs 200000

Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=128)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"
    os.makedirs(local_dir, exist_ok=True)
    spark = (
        SparkSession.builder.appName(f"profile-{args.cores}")
        .master(f"local[{args.cores}]")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", local_dir)
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing import builder as B

    cfg = IndexConfig(
        index_name="profile",
        unique_id_col="uniqueId",
        number_of_shards=args.shards,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "code_standard"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
            FieldConfig("repo", index_as=(IndexAs("repo", "lcKeyword"),)),
        ),
        docs_per_bucket=8192,
    )

    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(args.corpus)
        for f in fs
        if f.endswith(".parquet")
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", max(1 << 22, total_bytes // 128))
    corpus = spark.read.parquet(args.corpus)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix=f"prof{args.cores}_", dir=scratch)
    path = f"{work}/index"
    phases: dict[str, float] = {}

    def clock(name):
        class _C:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                phases[name] = round(time.perf_counter() - self.t0, 2)

        return _C()

    t_all = time.perf_counter()
    uid = cfg.unique_id_col
    corpus2 = corpus.withColumn(uid, F.col(uid).cast("string"))
    with clock("id_offsets"):
        offsets = B.id_offsets(corpus2, cfg)

    tables = B.build_index(corpus, cfg)
    # replicate write_index stepwise
    with clock("postings_write"):
        (
            tables.postings.repartition("field", "shard")
            .sortWithinPartitions("term", "bucket", "block_id")
            .write.mode("overwrite")
            .partitionBy("field")
            .parquet(os.path.join(path, "postings"))
        )
    with clock("doc_map_write"):
        tables.doc_map.write.mode("overwrite").parquet(os.path.join(path, "doc_map"))
    postings = spark.read.parquet(os.path.join(path, "postings"))
    term_stats, field_stats = B.stats_from_postings(postings)
    with clock("term_stats_write"):
        (
            term_stats.repartition("field")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("field")
            .parquet(os.path.join(path, "term_stats"))
        )
    with clock("field_stats_write"):
        field_stats.write.mode("overwrite").parquet(os.path.join(path, "field_stats"))
    with clock("shard_counts_write"):
        doc_map = spark.read.parquet(os.path.join(path, "doc_map"))
        doc_map.groupBy("shard").agg(F.count(F.lit(1)).alias("num_docs")).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "shard_counts"))
    phases["total"] = round(time.perf_counter() - t_all, 2)
    phases["cores"] = args.cores
    print(json.dumps(phases), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

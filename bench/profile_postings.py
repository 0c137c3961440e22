#!/usr/bin/env python
"""Sub-phase profiler for the postings build (tokenize vs shuffle+encode
vs parquet write) at one parallelism level:

    python bench/profile_postings.py --cores 8 --corpus /tmp/zscaling_corpus_200000

Each sub-phase is measured with a noop sink so upstream work is the
only cost; phases are cumulative (tokenize; tokenize+encode;
tokenize+encode+write) — differences attribute the increments.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=128)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from zuliasearch_spark.util.alloc import export_env, worker_env_configs

    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"
    os.makedirs(local_dir, exist_ok=True)
    export_env()
    builder = (
        SparkSession.builder.appName(f"profpost-{args.cores}")
        .master(f"local[{args.cores}]")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", local_dir)
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in worker_env_configs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing import builder as B

    cfg = IndexConfig(
        index_name="profpost",
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
    phases: dict[str, float] = {}

    from pyspark.sql import functions as F

    uid = cfg.unique_id_col
    corpus = corpus.withColumn(uid, F.col(uid).cast("string"))
    t0 = time.perf_counter()
    offsets = B.id_offsets(corpus, cfg)
    phases["id_offsets"] = round(time.perf_counter() - t0, 2)

    field_specs = [
        (stored_col, ia.indexed_field_name, cfg.analyzer(ia.analyzer_name))
        for stored_col, ia in cfg.indexed_fields()
    ]
    cols = list(dict.fromkeys(c for c, _, _ in field_specs))
    tall = corpus.select(uid, *cols).mapInArrow(
        B._make_tokenizer(
            field_specs, cfg.store_positions, id_cfg=(offsets, cfg.number_of_shards), uid_col=uid
        ),
        B.TALL_SCHEMA,
    )

    t0 = time.perf_counter()
    tall.write.format("noop").mode("overwrite").save()
    phases["tokenize"] = round(time.perf_counter() - t0, 2)

    postings = B.build_postings(tall, cfg)
    t0 = time.perf_counter()
    postings.write.format("noop").mode("overwrite").save()
    phases["tok_shuffle_encode"] = round(time.perf_counter() - t0, 2)

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix=f"profpost{args.cores}_", dir=scratch)
    t0 = time.perf_counter()
    (
        postings.repartition("field", "shard")
        .sortWithinPartitions("term", "bucket", "block_id")
        .write.mode("overwrite")
        .partitionBy("field")
        .parquet(os.path.join(work, "postings"))
    )
    phases["tok_enc_write"] = round(time.perf_counter() - t0, 2)
    phases["cores"] = args.cores
    print(json.dumps(phases), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

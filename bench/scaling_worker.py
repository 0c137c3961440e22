#!/usr/bin/env python
"""Scaling-protocol worker: one (cores, corpus) measurement.

Launched via ``spark-submit --master local[N] --py-files
zuliasearch_spark.zip bench/scaling_worker.py ...`` by
``bench/scaling.py`` (BASELINE.md §4). The Spark PLAN is held fixed
across parallelism levels — same corpus parquet, same shard count,
same shuffle partitions, same input split layout — only the executor
thread count differs, so the ratio of wall-clocks isolates scaling.

Prints one JSON line: build seconds + docs/sec, query-set seconds +
queries/sec.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=128)
    ap.add_argument("--query-reps", type=int, default=4)
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    from zuliasearch_spark.util.alloc import export_env, worker_env_configs

    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
    export_env()
    builder = (
        SparkSession.builder.appName(f"scaling-{args.cores}")
        .config("spark.local.dir", local_dir or "/tmp")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "false")  # fixed plan across runs
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # resident-pool batch sizing (see zuliasearch_spark/util/alloc.py)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in worker_env_configs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from bench import bench_query_set
    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing.builder import build_index, read_index, write_index
    from zuliasearch_spark.search.executor import SearchEngine

    cfg = IndexConfig(
        index_name="scaling",
        unique_id_col="uniqueId",
        number_of_shards=args.shards,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "code_standard"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
            FieldConfig("repo", index_as=(IndexAs("repo", "lcKeyword"),)),
        ),
        docs_per_bucket=8192,  # >= cores x fields encode groups at this sf
    )

    # fixed split sizing at BOTH levels (identical plan + identical
    # scan-order doc ids): ~128 splits regardless of core count
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(args.corpus)
        for f in fs
        if f.endswith(".parquet")
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", max(1 << 22, total_bytes // 128))
    corpus = spark.read.parquet(args.corpus)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix=f"scale{args.cores}_", dir=scratch)
    try:
        # Untimed warm-up: run the SAME build over a small file-prefix
        # slice so every python worker daemon faults its allocator
        # pools, the JVM JITs the scan/shuffle/parquet paths, and the
        # Arrow kernels import — all at steady-state batch shapes.
        # These are fixed PER-PROCESS startup costs: a production
        # build running for hours amortizes them to nothing, but at
        # benchmark scale they bill ~O(10 s) x n_workers against the
        # timed window — i.e. 4x more against the high level — and
        # would measure startup, not scaling. Identical warm-up at
        # both levels.
        import glob

        warm_files = sorted(glob.glob(os.path.join(args.corpus, "*.parquet")))[
            : max(16, 2 * args.cores)
        ]
        if warm_files:
            warm = spark.read.parquet(*warm_files)
            write_index(build_index(warm, cfg), f"{work}/warm_index")
            shutil.rmtree(f"{work}/warm_index", ignore_errors=True)

        t0 = time.perf_counter()
        tables = build_index(corpus, cfg)
        tables = write_index(tables, f"{work}/index")
        t_build = time.perf_counter() - t0

        # query phase: one shuffle partition per shard group — the
        # batch kernel produces exactly #shards groups, and the extra
        # 96 empty reduce tasks per job were pure driver-side
        # scheduling overhead, a per-rep constant that caps scaling
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shards))
        tables = read_index(spark, f"{work}/index", cfg)
        engine = SearchEngine(tables)
        # serving topology at both levels: postings resident in
        # executor memory, shard-partitioned — query batches run
        # shuffle-free against co-located partitions (executor.pin)
        engine.pin()
        qset = dict(bench_query_set())
        # widen the batch so kernel work (not fixed per-job driver
        # cost) dominates: single/pair/triple-term queries over the
        # fixture vocabulary — a serving engine's query stream
        from zuliasearch_spark.indexing.corpus import CORE_WORDS, IDENTIFIERS
        from zuliasearch_spark.search.query import QueryClause, SearchRequest

        vocab = list(CORE_WORDS) + [IDENTIFIERS[i] for i in range(0, 400, 2)]
        for i in range(len(vocab)):
            a = vocab[i]
            b = vocab[(i * 7 + 3) % len(vocab)]
            if i % 3 == 0:
                q = a
            elif i % 3 == 1:
                q = f"{a} {b}"
            else:
                q = f"{a} {b} {vocab[(i * 13 + 5) % len(vocab)]}"
            qset[f"gen{i}"] = SearchRequest(
                (QueryClause("SCORE_SHOULD", q=q, qf=("content",)),), amount=10
            )
        engine.search_many(qset, fetch="none")  # warm
        t0 = time.perf_counter()
        for _ in range(args.query_reps):
            engine.search_many(qset, fetch="none")
        t_query = time.perf_counter() - t0
        n_q = args.query_reps * len(qset)
        print(
            json.dumps(
                {
                    "cores": args.cores,
                    "docs": args.docs,
                    "build_sec": round(t_build, 2),
                    "build_docs_per_sec": round(args.docs / t_build, 1),
                    "query_sec": round(t_query, 2),
                    "qps": round(n_q / t_query, 2),
                    "n_queries": len(qset),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Query-phase profiler for the scaling protocol.

Reads a PREBUILT index (build it once with --build) and times the
same widened query batch the scaling worker uses, printing per-rep
wall seconds plus the engine's job/gather split — so query-path
scaling work can iterate without paying a rebuild per measurement.

    python bench/profile_query.py --build --corpus /tmp/zscaling_corpus_200000 \
        --index /dev/shm/profq_index
    python bench/profile_query.py --cores 2 --index /dev/shm/profq_index
    python bench/profile_query.py --cores 8 --index /dev/shm/profq_index
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def session(cores: int, shuffle_partitions: int):
    from pyspark.sql import SparkSession

    from zuliasearch_spark.util.alloc import export_env, worker_env_configs

    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"
    os.makedirs(local_dir, exist_ok=True)
    export_env()
    builder = (
        SparkSession.builder.appName(f"profq-{cores}")
        .master(f"local[{cores}]")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", local_dir)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
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
    return spark


def index_config(shards: int):
    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig

    return IndexConfig(
        index_name="profq",
        unique_id_col="uniqueId",
        number_of_shards=shards,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "code_standard"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
            FieldConfig("repo", index_as=(IndexAs("repo", "lcKeyword"),)),
        ),
        docs_per_bucket=8192,
    )


def query_set():
    from bench import bench_query_set
    from zuliasearch_spark.indexing.corpus import CORE_WORDS, IDENTIFIERS
    from zuliasearch_spark.search.query import QueryClause, SearchRequest

    qset = dict(bench_query_set())
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
    return qset


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--corpus", default="/tmp/zscaling_corpus_200000")
    ap.add_argument("--index", default="/dev/shm/profq_index")
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--pin", action="store_true")
    args = ap.parse_args()

    cfg = index_config(args.shards)
    if args.build:
        spark = session(8, 128)
        from zuliasearch_spark.indexing.builder import build_index, write_index

        corpus = spark.read.parquet(args.corpus)
        t0 = time.perf_counter()
        write_index(build_index(corpus, cfg), args.index)
        print(json.dumps({"built_sec": round(time.perf_counter() - t0, 2)}))
        spark.stop()
        return

    spark = session(args.cores, args.shards)
    from zuliasearch_spark.indexing.builder import read_index
    from zuliasearch_spark.search.executor import SearchEngine

    tables = read_index(spark, args.index, cfg)
    engine = SearchEngine(tables)
    if args.pin:
        engine.pin()
    qset = query_set()
    engine.search_many(qset, fetch="none")  # warm
    reps = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        engine.search_many(qset, fetch="none")
        wall = time.perf_counter() - t0
        m = dict(engine.last_metrics)
        reps.append(
            {
                "wall_s": round(wall, 3),
                "job_ms": m.get("job_ms"),
                "gather_ms": m.get("gather_ms"),
                "other_ms": int(wall * 1000) - (m.get("job_ms") or 0) - (m.get("gather_ms") or 0),
            }
        )
    print(json.dumps({"cores": args.cores, "n_queries": len(qset), "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One headline-bench trial (phases 2+3 of bench.py only): code-corpus
index build + BM25 query set. Run by bench/headline_ab.py with cwd +
PYTHONPATH pointing at the revision under test, so ``zuliasearch_spark``
and ``bench`` resolve from that revision's tree.

AB_STYLE selects the revision's own bench methodology:
  r1   — corpus .repartition(cpus*4), unpinned query path,
         shuffle.partitions = cpus*4 (BENCH_r01 protocol)
  head — split-sized scan, shuffle.partitions = n_shards for the query
         phase, postings pinned resident (BENCH_r02+ protocol); also
         measures the unpinned set at cpus*4 first, directly comparable
         to the r1 number.

Prints one ``ABRESULT {json}`` line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    style = os.environ["AB_STYLE"]
    cpus = int(os.environ.get("AB_CPUS", "32"))
    n_docs = int(os.environ.get("AB_DOCS", "200000"))
    reps = int(os.environ.get("AB_REPS", "3"))

    import bench  # the revision's own bench.py (query set + config)
    from zuliasearch_spark.indexing.builder import build_index, read_index, write_index
    from zuliasearch_spark.indexing.corpus import gen_corpus_spark
    from zuliasearch_spark.search.executor import SearchEngine
    from zuliasearch_spark.session import get_spark

    spark = get_spark(app="ab", master=f"local[{cpus}]", shuffle_partitions=cpus * 4)
    out: dict = {"style": style, "docs": n_docs, "cpus": cpus}
    work = tempfile.mkdtemp(
        prefix="zab_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        corpus_path = os.path.join(work, "corpus")
        index_path = os.path.join(work, "index")
        gen_corpus_spark(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
        if style == "r1":
            corpus = spark.read.parquet(corpus_path).repartition(cpus * 4)
        else:
            total_bytes = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(corpus_path)
                for f in fs
                if f.endswith(".parquet")
            )
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes",
                max(4 << 20, total_bytes // (cpus * 2)),
            )
            corpus = spark.read.parquet(corpus_path)
        cfg = bench.code_bench_config()

        t0 = time.perf_counter()
        tables = build_index(corpus, cfg)
        write_index(tables, index_path)
        build_sec = time.perf_counter() - t0
        out["build_sec"] = round(build_sec, 3)
        out["docs_per_sec"] = round(n_docs / build_sec, 1)

        tables = read_index(spark, index_path, cfg)
        eng = SearchEngine(tables)
        qset = bench.bench_query_set()

        def run_set() -> float:
            t = time.perf_counter()
            eng.search_many(qset)
            return time.perf_counter() - t

        run_set()  # warm (JVM/Arrow/plan caches)
        unpinned = [round(run_set(), 3) for _ in range(reps)]
        out["qset_unpinned_secs"] = unpinned
        out["qset_unpinned_sec"] = min(unpinned)

        if style == "head":
            spark.conf.set("spark.sql.shuffle.partitions", str(cfg.number_of_shards))
            eng.pin()
            run_set()  # warm the resident path
            pinned = [round(run_set(), 3) for _ in range(reps)]
            out["qset_pinned_secs"] = pinned
            out["qset_pinned_sec"] = min(pinned)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print("ABRESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
    sys.exit(0)

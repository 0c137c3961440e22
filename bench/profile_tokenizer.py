#!/usr/bin/env python
"""Standalone analyzer-kernel saturation probe (no Spark).

Runs term_freqs_positions over the same parquet content slab with
1..K worker processes and prints MB/s per level — isolates whether
the tokenize stage's 2->8 core scaling is limited by the kernel
itself (host memory bandwidth) or by Spark-side plumbing.

    python bench/profile_tokenizer.py --corpus /tmp/zscaling_corpus_200000 --levels 1,2,8
"""

from __future__ import annotations

import argparse
import glob
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(files, positions, out_q):
    import pyarrow.parquet as pq

    from zuliasearch_spark.analysis.analyzers import term_freqs, term_freqs_positions
    from zuliasearch_spark.config import IndexConfig

    cfg = IndexConfig(
        index_name="probe", unique_id_col="uniqueId", number_of_shards=32,
        default_search_fields=("content",), field_configs=(),
    )
    settings = cfg.analyzer("code_standard")
    nbytes = 0
    ntok = 0
    t0 = time.perf_counter()
    for f in files:
        col = pq.read_table(f, columns=["content"]).column("content").combine_chunks()
        for chunk in col.chunks if hasattr(col, "chunks") else [col]:
            nbytes += chunk.nbytes
            if positions:
                d, t, tf, dl, pos = term_freqs_positions(chunk, settings)
            else:
                d, t, tf, dl = term_freqs(chunk, settings)
            ntok += int(tf.sum())
    out_q.put((nbytes, ntok, time.perf_counter() - t0))


def run_level(files, n_procs, positions):
    # shard the file list round-robin so every process gets equal bytes
    chunks = [files[i::n_procs] for i in range(n_procs)]
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(c, positions, q)) for c in chunks]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    total_mb = sum(r[0] for r in results) / 1e6
    return {"procs": n_procs, "wall": round(wall, 2), "mb_s": round(total_mb / wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--levels", default="1,2,8")
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--no-positions", action="store_true")
    args = ap.parse_args()
    files = sorted(glob.glob(os.path.join(args.corpus, "*.parquet")))[: args.files]
    out = []
    for lvl in [int(x) for x in args.levels.split(",")]:
        out.append(run_level(files, lvl, not args.no_positions))
        print(json.dumps(out[-1]), flush=True)
    base = out[0]["mb_s"] / out[0]["procs"]
    for r in out[1:]:
        r["efficiency_vs_first"] = round((r["mb_s"] / r["procs"]) / base, 3)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()

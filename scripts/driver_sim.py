#!/usr/bin/env python
"""Simulate the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark at sf0.01 and compare
row-count + schema + order-insensitive value-hash against the
matching ``oracle_sql()`` executed by DuckDB on the same parquet.

Exit 0 iff every query matches (and entry() smoke passes).
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(repr(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as mod
    from zuliasearch_spark.session import get_spark

    spark = get_spark(app="driver_sim", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    smoke = mod.entry(spark)
    n = len(smoke.collect())
    print(f"entry() smoke: {n} rows, schema={smoke.columns}")

    oracles = mod.oracle_sql()
    only = set(sys.argv[1:])  # optional: gate names to check (default all)
    failures = 0
    for name, fn in mod.queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name}: NO ORACLE (rows-only) -> {len(srows)} rows")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = [tuple(r) for r in ores.fetchall()]
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_h = ok_n and ok_c and value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK" if (ok_n and ok_c and ok_h) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"  {name}: {status} rows={len(srows)}/{len(orows)} cols={scols}/{ocols}")
            for a, b in list(zip(sorted(srows), sorted(orows)))[:5]:
                if a != b:
                    print(f"    spark={a}  oracle={b}")
        else:
            print(f"  {name}: OK ({len(srows)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

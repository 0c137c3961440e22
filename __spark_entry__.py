"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in ``zuliasearch_spark.gate``; the
engine itself is ``zuliasearch_spark`` (inverted-index build + BM25
top-k executor + training-data pipeline ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 over the sf0.001 documents table."""
    from zuliasearch_spark.gate import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from zuliasearch_spark.gate import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from zuliasearch_spark.gate import ORACLE_SQL

    return dict(ORACLE_SQL)

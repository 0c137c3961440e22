from zuliasearch_spark.oracle.bm25_oracle import OracleIndex

__all__ = ["OracleIndex"]

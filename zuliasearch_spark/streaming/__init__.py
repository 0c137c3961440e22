from zuliasearch_spark.streaming.incremental import incremental_index  # noqa: F401

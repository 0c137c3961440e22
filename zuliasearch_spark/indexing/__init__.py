from zuliasearch_spark.indexing.corpus import gen_corpus_pandas

__all__ = ["gen_corpus_pandas"]

from zuliasearch_spark.analysis.analyzers import analyze_series, term_freqs

__all__ = ["analyze_series", "term_freqs"]

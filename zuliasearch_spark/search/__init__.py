from zuliasearch_spark.search.query import QueryClause, SearchRequest
from zuliasearch_spark.search.scorer import Bm25Params, bm25_norm_inverse_cache, bm25_weight

__all__ = [
    "QueryClause",
    "SearchRequest",
    "Bm25Params",
    "bm25_weight",
    "bm25_norm_inverse_cache",
]

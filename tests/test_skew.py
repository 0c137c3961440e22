"""Hot-term skew: the build's reducer-size invariant.

The north rule requires the build to defuse hot-term skew explicitly.
Design (builder docstring): postings groups are keyed (field, shard,
bucket) with bucket = doc_id >> log2(docs_per_bucket), so a reducer's
input is bounded by the BUCKET's size — independent of any term's
document frequency. A pathological corpus where EVERY doc contains
the same hot term must produce (a) bounded per-group row counts and
(b) the hot term's postings spread across all buckets, doc-ordered.
"""

import numpy as np
import pandas as pd

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


def test_hot_term_spans_buckets_not_one_reducer(spark):
    n = 600
    rows = [
        {
            "uniqueId": f"u{i:05d}",
            "content": "hotword " * 5 + f"unique_{i} filler{i % 7}",
            "lang": "python",
            "path": f"p{i}",
            "repo": f"r{i % 3}",
        }
        for i in range(n)
    ]
    corpus = pd.DataFrame(rows)
    cfg = code_config(num_shards=1, docs_per_bucket=64, block_size=16)
    tables = build_index(spark.createDataFrame(corpus), cfg).persist()
    try:
        hot = (
            tables.postings.filter("field = 'content' AND term = 'hotword'")
            .select("bucket", "block_id", "n", "first_doc", "last_doc")
            .toPandas()
            .sort_values(["bucket", "block_id"])
        )
        # hot term present in EVERY doc → must span ceil(600/64) buckets
        assert hot["bucket"].nunique() == (n + 63) // 64
        # reducer-size invariant: no group's hot-term postings exceed
        # docs_per_bucket regardless of df
        per_bucket = hot.groupby("bucket")["n"].sum()
        assert per_bucket.max() <= 64
        # bucket order == docID order (query kernel concatenates blocks)
        assert (hot["first_doc"].to_numpy() == np.sort(hot["first_doc"].to_numpy())).all()

        # and the hot-term query still answers correctly: df == n
        eng = SearchEngine(tables)
        res = eng.search(
            SearchRequest((C("SCORE_SHOULD", q="hotword", qf=("content",)),), amount=5),
            fetch="none",
        )
        assert res["totalHits"] == n
    finally:
        tables.unpersist()

"""Multi-key field sorts with multivalued MIN/MAX selectors and
per-doc docTerms.

Reference semantics: repeated FieldSort list with per-key direction +
missingLast (ShardReader.buildSortFromSortRequest:605-697), Lucene
SortedNumericSelector MIN/MAX for multivalued fields; per-document
term vectors AnalysisHandler.java:44-209 ``docTerms``.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import code_config
from zuliasearch_spark.analysis.analyzers import analyze_query_text
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


@pytest.fixture(scope="module")
def engine(spark, corpus_t1):
    df = spark.createDataFrame(corpus_t1)
    # a multivalued numeric stored column for selector sorts: value
    # pairs derived from the path hash, deterministic and collision-y
    df = df.withColumn(
        "sizes",
        F.array(
            (F.abs(F.xxhash64("path")) % 7).cast("int"),
            ((F.abs(F.xxhash64("path")) % 11) + 20).cast("int"),
        ),
    )
    cfg = code_config(num_shards=2, quantize_norms=False)
    tables = build_index(df, cfg, stored_cols=("path", "lang", "sizes", "content")).persist()
    yield SearchEngine(tables), df
    tables.unpersist()


def _match_pd(engine_tuple, q="def"):
    eng, df = engine_tuple
    req = SearchRequest((C("FILTER", q=f"content:{q}"),), amount=1)
    matched = (
        eng.match_ids(req)
        .join(eng.tables.doc_map, ["shard", "doc_id"])
        .select("uniqueId", "path", "lang", "sizes")
        .toPandas()
    )
    return req, matched


def test_multi_key_sort_matches_pandas(engine):
    req, matched = _match_pd(engine)
    eng, _ = engine
    got = eng.sort_search(
        req,
        sort_keys=(("lang", True, True), ("path", False, True)),
        amount=15,
        tiebreak=("uniqueId",),
    ).collect()
    exp = matched.sort_values(
        ["lang", "path", "uniqueId"], ascending=[True, False, True]
    ).head(15)
    assert [r["uniqueId"] for r in got] == list(exp["uniqueId"])


def test_selector_min_max_over_array_column(engine):
    req, matched = _match_pd(engine)
    eng, _ = engine
    got_min = eng.sort_search(
        req, sort_keys=(("sizes", True, True, "MIN"),), amount=10, tiebreak=("uniqueId",)
    ).collect()
    exp_min = matched.assign(k=matched["sizes"].map(min)).sort_values(["k", "uniqueId"]).head(10)
    assert [r["uniqueId"] for r in got_min] == list(exp_min["uniqueId"])

    got_max = eng.sort_search(
        req, sort_keys=(("sizes", False, True, "MAX"),), amount=10, tiebreak=("uniqueId",)
    ).collect()
    exp_max = (
        matched.assign(k=matched["sizes"].map(max))
        .sort_values(["k", "uniqueId"], ascending=[False, True])
        .head(10)
    )
    assert [r["uniqueId"] for r in got_max] == list(exp_max["uniqueId"])


def test_unknown_selector_raises(engine):
    eng, _ = engine
    req = SearchRequest((C("FILTER", q="content:def"),), amount=1)
    with pytest.raises(ValueError, match="selector"):
        eng.sort_search(req, sort_keys=(("sizes", True, True, "AVG"),), amount=5).collect()


def test_doc_terms_per_doc_topn(engine, spark, corpus_t1):
    eng, df = engine
    req = SearchRequest((C("FILTER", q="content:merge"),), amount=1)
    # id_col must be an integer-typed column: derive one from uniqueId
    docs2 = df.select(
        F.abs(F.xxhash64("uniqueId")).alias("nid"), "uniqueId", F.col("content").alias("text")
    )
    out = eng.analysis_doc_terms(
        req, docs2, ["uniqueId"], "text", "nid", "whitespace_lc", top_n=3, term_sort="TF"
    ).toPandas()
    assert not out.empty
    # per-doc oracle: re-analyze in python, top-3 by (tf desc, term asc)
    settings = eng.config.analyzer("whitespace_lc")
    nid_map = {r["nid"]: r["text"] for r in docs2.collect()}
    for nid, grp in out.groupby("nid"):
        counts = Counter(analyze_query_text(nid_map[nid], settings))
        exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = sorted(
            zip(grp["term"], grp["tf"]), key=lambda kv: (-kv[1], kv[0])
        )
        assert [(t, int(c)) for t, c in got] == exp
        assert len(grp) <= 3


def test_sort_search_after_pages_equal_unpaged(engine):
    """Field-sort searchAfter (LastResult sortValues → Lucene
    searchAfter(FieldDoc), ZuliaIndex.java:1034-1104): walking a
    sorted scan in 3 cursor pages must reproduce the unpaged global
    sort exactly — including a null-bearing sort key and a MAX
    selector key."""
    eng, df = engine
    req = SearchRequest((C("FILTER", q="content:def"),), amount=1)
    sort_keys = (("lang", True, True), ("sizes", False, True, "MAX"))
    tb = ("uniqueId",)
    full = eng.sort_search(req, sort_keys=sort_keys, amount=1000, tiebreak=tb).collect()
    assert len(full) > 9, "fixture too small for 3 pages"
    page = max(3, len(full) // 3 + 1)
    got = []
    after = None
    while True:
        rows = eng.sort_search(
            req, sort_keys=sort_keys, amount=page, tiebreak=tb, after=after
        ).collect()
        if not rows:
            break
        got.extend(rows)
        if len(rows) < page:
            break
        after = eng.sort_cursor(rows[-1], sort_keys, tb)
    assert [r["uniqueId"] for r in got] == [r["uniqueId"] for r in full]


def test_sort_search_after_null_key_pages(spark):
    """Cursor stepping across a null sort value (missingLast) and
    into/out of the null region."""
    import pandas as pd

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig

    cfg = IndexConfig(
        index_name="pg",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    rows = [(f"p{i}", "x", None if i % 3 == 0 else i % 5) for i in range(12)]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "k"])
    pdf["k"] = pdf["k"].astype("Int64")
    tables = build_index(spark.createDataFrame(pdf), cfg, stored_cols=("k",)).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("FILTER", q="content:x"),), amount=1)
        sk = (("k", True, True),)
        full = eng.sort_search(req, sort_keys=sk, amount=100).collect()
        assert len(full) == 12
        got, after = [], None
        for _ in range(6):
            rows = eng.sort_search(req, sort_keys=sk, amount=3, after=after).collect()
            if not rows:
                break
            got.extend(rows)
            after = eng.sort_cursor(rows[-1], sk)
        assert [(r["uniqueId"], r["k"]) for r in got] == [
            (r["uniqueId"], r["k"]) for r in full
        ]
    finally:
        tables.unpersist()

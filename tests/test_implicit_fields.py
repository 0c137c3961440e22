"""Implicit engine fields, the reference's always-present Lucene
fields (ZuliaFieldConstants.java:7-25; ShardDocumentIndexer
.getIndexDocument adds them to EVERY document):

- ``zuliaId`` — the uniqueId indexed verbatim (StringField), queryable
  with term/TERMS queries (TermQueryTest.java:160-165) and sortable as
  ID_SORT_FIELD (SortTest.zuliaSort:505-518)
- ``zuliaScore`` — the score as a field-sort key, ascending included
  (SortTest.zuliaSort:491-502)
- ``_ztsf_`` — the Store wall-clock timestamp, queryable with DATE
  range syntax (SimpleTest.java:304-325)
- ``|field|`` / ``|||field|||`` length-meta SORTS with an error on
  unknown base fields (SortTest.lengthSort:539-560)
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

TS = 1755475200000  # fixed build wall clock (epoch ms)


@pytest.fixture(scope="module")
def engine(spark, corpus_t1):
    df = spark.createDataFrame(corpus_t1)
    df = df.withColumn(
        "tags",
        F.array_repeat(F.lit("t"), (F.abs(F.xxhash64("path")) % 5).cast("int")),
    )
    cfg = code_config(
        num_shards=2,
        quantize_norms=False,
        index_id_field=True,
        store_timestamp=True,
    )
    tables = build_index(
        df, cfg, stored_cols=("path", "lang", "tags", "content"), timestamp=TS
    ).persist()
    yield SearchEngine(tables), df
    tables.unpersist()


def _uids(df, n):
    return [r["uniqueId"] for r in df.select("uniqueId").limit(n).collect()]


def test_zulia_id_terms_query(engine):
    """TermQuery("zuliaId") semantics (TermQueryTest.java:160-165):
    an exact-id term set matches exactly the named docs, misses
    ('blah') contribute nothing."""
    eng, df = engine
    uids = _uids(df, 3)
    req = SearchRequest(
        (C("TERMS", terms=tuple(uids) + ("blah", "not-an-id"), qf=("zuliaId",)),),
        amount=1,
    )
    assert eng.search(req, fetch="none")["totalHits"] == 3


def test_zulia_id_query_string(engine):
    """id:zl:tq-style exact lookup through the string grammar — the
    zuliaId field resolves like any KEYWORD-indexed field."""
    eng, df = engine
    uid = _uids(df, 1)[0]
    res = eng.search_string(f'zuliaId:"{uid}"', amount=1)
    assert res["totalHits"] == 1


def test_zulia_id_sort(engine):
    """SortTest.zuliaSort ID_SORT_FIELD branch: ascending returns the
    lexicographically-smallest uniqueId first, descending the largest
    (string order, not numeric — the '99 instead of 199' assert)."""
    eng, df = engine
    req = SearchRequest((C("FILTER", q="content:def"),), amount=1)
    all_uids = sorted(
        r["uniqueId"]
        for r in eng.match_ids(req)
        .join(eng.tables.doc_map, ["shard", "doc_id"])
        .select("uniqueId")
        .collect()
    )
    asc = eng.sort_search(req, sort_keys=(("zuliaId", True, True),), amount=1).collect()
    desc = eng.sort_search(req, sort_keys=(("zuliaId", False, True),), amount=1).collect()
    assert asc[0]["uniqueId"] == all_uids[0]
    assert desc[0]["uniqueId"] == all_uids[-1]


def test_zulia_score_sort(engine):
    """SortTest.zuliaSort SCORE_FIELD branch: Sort(zuliaScore)
    ascending surfaces the WORST-scoring match first; descending
    equals the default ranking's best."""
    eng, df = engine
    req = SearchRequest(
        # mini grammar: unscoped tokens are SHOULD under default_op OR
        # (a bare "OR" keyword now raises, directing to qs=)
        (C("SCORE_SHOULD", q="content:def content:return"),), amount=5
    )
    scored = (
        eng.match_ids(req).select("doc_id", "score").orderBy("score").collect()
    )
    lo = eng.sort_search(
        req, sort_keys=(("zuliaScore", True, True),), amount=1, tiebreak=("shard", "doc_id")
    ).collect()[0]
    hi = eng.sort_search(
        req, sort_keys=(("zuliaScore", False, True),), amount=1, tiebreak=("shard", "doc_id")
    ).collect()[0]
    assert lo["zuliaScore"] == pytest.approx(scored[0]["score"], rel=1e-6)
    assert hi["zuliaScore"] == pytest.approx(scored[-1]["score"], rel=1e-6)
    assert lo["zuliaScore"] <= hi["zuliaScore"]


def test_length_meta_sort(engine):
    """SortTest.lengthSort: |||tags||| orders by list length; the
    computed sort agrees with a pandas argsort over size(tags)."""
    eng, df = engine
    req = SearchRequest((C("FILTER", q="content:def"),), amount=1)
    matched = (
        eng.match_ids(req)
        .join(eng.tables.doc_map, ["shard", "doc_id"])
        .select("uniqueId", F.size("tags").alias("n"))
        .toPandas()
    )
    top = eng.sort_search(
        req, sort_keys=(("|||tags|||", False, True),), amount=1, tiebreak=("uniqueId",)
    ).collect()[0]
    mx = matched["n"].max()
    expect = matched[matched["n"] == mx]["uniqueId"].min()
    assert top["uniqueId"] == expect


def test_length_meta_sort_unknown_field_raises(engine):
    """SortTest.lengthSort asserts Sort("|||madeUp|||") throws."""
    eng, _ = engine
    req = SearchRequest((C("FILTER", q="content:def"),), amount=1)
    with pytest.raises(ValueError, match="madeUp"):
        eng.sort_search(req, sort_keys=(("|||madeUp|||", False, True),), amount=1)


def test_timestamp_ranges(engine):
    """SimpleTest.java:304-325: _ztsf_:[* TO *] matches everything;
    [yesterday TO tomorrow] everything; [* TO yesterday] and
    [tomorrow TO *] nothing."""
    eng, df = engine
    n = df.count()
    assert eng.search_string("_ztsf_:[* TO *]", amount=1)["totalHits"] == n
    assert (
        eng.search_string("_ztsf_:[2025-08-17 TO 2025-08-19]", amount=1)["totalHits"]
        == n
    )
    assert eng.search_string("_ztsf_:[* TO 2025-08-17]", amount=1)["totalHits"] == 0
    assert eng.search_string("_ztsf_:[2025-08-19 TO *]", amount=1)["totalHits"] == 0


def test_full_fetch_hides_internal_columns(engine):
    """FULL fetch returns the stored document only — internal _z*
    engine columns (here _ztsf_) never appear, like the reference's
    stored _zsdf_ document (ResultHelper)."""
    eng, df = engine
    uid = _uids(df, 1)[0]
    out = eng.fetch([uid], fetch_type="FULL")
    assert not [c for c in out.columns if c.startswith("_z")]
    assert "path" in out.columns


def test_match_all_sees_every_doc_with_id_field(engine):
    """With the implicit zuliaId field, *:* is a true MatchAllDocs —
    every stored doc has an id, so the exists-union covers the corpus
    even if all USER fields were null (closes the documented *:*
    deviation when index_id_field is on)."""
    eng, df = engine
    assert eng.search_string("*:*", amount=1)["totalHits"] == df.count()

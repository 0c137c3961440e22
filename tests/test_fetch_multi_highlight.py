"""Fetch shaping, multi-index search, highlighting, import/export/clear."""

import os

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.indexing.io import clear_index, export_index, import_documents
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.highlight import best_fragments, highlight, _pattern
from zuliasearch_spark.search.multi import MultiIndexSearcher
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

DOCS = [
    ("d0", "alpha beta gamma alpha", "en", 7),
    ("d1", "beta beta", "fr", 9),
    ("d2", "alpha delta", "de", 11),
    ("d3", "epsilon", "en", 13),
]


def _cfg(name="fx"):
    return IndexConfig(
        index_name=name,
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),),
        per_shard_stats=False,
        quantize_norms=False,
    )


@pytest.fixture(scope="module")
def engine(spark):
    pdf = pd.DataFrame(DOCS, columns=["uniqueId", "content", "lang", "n"])
    tables = build_index(spark.createDataFrame(pdf), _cfg(), stored_cols=("lang", "n")).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def test_fetch_types_and_masking(engine):
    full = {r["uniqueId"]: r.asDict() for r in engine.fetch(["d0", "d2"]).collect()}
    assert set(full) == {"d0", "d2"}
    assert full["d0"]["lang"] == "en" and full["d0"]["n"] == 7
    assert "content_sha256" in full["d0"]

    meta = engine.fetch(["d0"], fetch_type="META").columns
    assert set(meta) == {"uniqueId", "shard", "doc_id", "content_sha256"}
    none = engine.fetch(["d0"], fetch_type="NONE").columns
    assert set(none) == {"uniqueId", "shard", "doc_id"}

    proj = engine.fetch(["d0"], document_fields=("lang", "n")).columns
    assert "content_sha256" not in proj and "lang" in proj
    masked = engine.fetch(["d0"], document_fields=("lang", "n"), document_masked_fields=("lang",)).columns
    assert "lang" not in masked and "n" in masked


def test_multi_index_merge_and_aliases(spark):
    a = pd.DataFrame(DOCS[:2], columns=["uniqueId", "content", "lang", "n"])
    b = pd.DataFrame(DOCS[2:], columns=["uniqueId", "content", "lang", "n"])
    ta = build_index(spark.createDataFrame(a), _cfg("ia")).persist()
    tb = build_index(spark.createDataFrame(b), _cfg("ib")).persist()
    try:
        ms = MultiIndexSearcher(
            {"ia": SearchEngine(ta), "ib": SearchEngine(tb)},
            aliases={"everything": "ia", "chain": "everything"},
        )
        assert ms.resolve("chain") == "ia"
        req = SearchRequest((C("SCORE_SHOULD", q="alpha", qf=("content",)),), amount=10)
        res = ms.search(req)
        got = [(t["uniqueId"], t["index"]) for t in res["topk"]]
        assert {u for u, _ in got} == {"d0", "d2"}
        assert dict(got) == {"d0": "ia", "d2": "ib"}
        assert res["totalHits"] == 2
        # single-alias search hits only ia
        only = ms.search(req, indexes=("chain",))
        assert {t["uniqueId"] for t in only["topk"]} == {"d0"}
        with pytest.raises(KeyError):
            ms.resolve("nope")
        # index-name wildcards expand to concrete indexes, never
        # aliases, and an empty expansion errors (WildcardIndexTest)
        both = ms.search(req, indexes=("i*",))
        assert {t["uniqueId"] for t in both["topk"]} == {"d0", "d2"}
        with pytest.raises(KeyError):
            ms.expand("nonexistent-*")
        with pytest.raises(KeyError):
            ms.expand("every*")  # matches only the ALIAS -> error
    finally:
        ta.unpersist()
        tb.unpersist()


def test_highlight_whole_and_fragments(spark, engine):
    req = SearchRequest((C("FILTER", q="content:alpha"),), amount=10)
    matches = engine.match_ids(req).select("shard", "doc_id")
    j = matches.join(engine.tables.doc_map, ["shard", "doc_id"])
    docs = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["uniqueId", "content", "lang", "n"])
    ).select("uniqueId", "content")
    j = j.join(docs, "uniqueId")

    whole = {r["uniqueId"]: r.asDict() for r in highlight(j, "content", ("alpha",), n_fragments=0).collect()}
    assert whole["d0"]["highlighted"] == "<em>alpha</em> beta gamma <em>alpha</em>"
    assert whole["d0"]["n_tagged"] == 2
    assert whole["d2"]["n_tagged"] == 1

    fr = {r["uniqueId"]: r["fragments"] for r in highlight(j, "content", ("alpha",), n_fragments=2, fragment_size=12).collect()}
    assert all(len(f) >= 1 for f in fr.values())
    assert any("<em>alpha</em>" in frag for frag in fr["d0"])


def test_best_fragments_scoring():
    text = "x y z alpha q w alpha alpha r s t u v nothing here at all"
    pat = _pattern(("alpha",))
    frags = best_fragments(text, pat, "<em>", "</em>", n_fragments=2, fragment_size=16)
    assert len(frags) == 2
    # densest fragment first
    assert frags[0].count("<em>") >= frags[1].count("<em>")
    assert "nothing" not in " ".join(frags)


def test_export_import_clear(spark, engine, tmp_path_factory):
    dump = str(tmp_path_factory.mktemp("dump"))
    export_index(engine.tables, dump)
    docs, cfg = import_documents(spark, dump)
    assert docs.count() == len(DOCS)
    assert cfg.index_name == "fx"
    assert {r["uniqueId"] for r in docs.collect()} == {d[0] for d in DOCS}

    victim = str(tmp_path_factory.mktemp("to_clear"))
    os.makedirs(os.path.join(victim, "segments"), exist_ok=True)
    with open(os.path.join(victim, "manifest.jsonl"), "w") as f:
        f.write("{}\n")
    clear_index(victim)
    assert os.listdir(victim) == []


def test_vector_clauses(spark):
    """VECTOR constrains to KNN top-k over the pre-filter;
    VECTOR_SHOULD only adds similarity to the boolean score."""
    rows = [
        ("v0", "alpha common", [1.0, 0.0, 0.0]),
        ("v1", "alpha common", [0.9, 0.1, 0.0]),
        ("v2", "alpha common", [0.0, 1.0, 0.0]),
        ("v3", "beta common", [1.0, 0.0, 0.0]),  # excluded by pre-filter
        ("v4", "alpha common", None),  # no vector: can't match VECTOR
    ]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "vec"])
    cfg = _cfg("vx")
    sdf = spark.createDataFrame(pdf)
    tables = build_index(sdf, cfg, stored_cols=("vec",)).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("FILTER", q="content:alpha"),), amount=10)
        res = eng.search_vector(req, [1.0, 0.0, 0.0], "vec", k=2)
        got = [t["uniqueId"] for t in res["topk"]]
        assert got == ["v0", "v1"]  # KNN top-2 among alpha docs
        assert res["topk"][0]["score"] == pytest.approx(1.0, abs=1e-4)

        # VECTOR_SHOULD: all alpha docs match; top-2 get cosine added
        req2 = SearchRequest((C("SCORE_SHOULD", q="common", qf=("content",)),), amount=10)
        res2 = eng.search_vector(req2, [1.0, 0.0, 0.0], "vec", k=2, should=True, amount=10)
        assert res2["totalHits"] == 5
        by_uid = {t["uniqueId"]: t["score"] for t in res2["topk"]}
        # v0/v3 tie for the top cosine (both exactly the query vector);
        # deterministic (shard, doc_id) tiebreak picks 2 of {v0,v1,v3}
        boosted = [u for u in ("v0", "v1", "v3") if by_uid[u] > by_uid["v2"]]
        assert len(boosted) == 2
        assert by_uid["v2"] == pytest.approx(by_uid["v4"], abs=1e-6)
    finally:
        tables.unpersist()


def test_vector_should_no_match_set_collect(spark, monkeypatch):
    """VECTOR_SHOULD must merge KNN scores via a broadcast join and
    order+limit IN-PLAN: no driver-side collect may ever return more
    than the requested page (r2 regression: the full match set was
    collect()ed and merged in a Python loop — O(matches) driver
    memory at scale)."""
    import numpy as np

    n = 300
    rng = np.random.default_rng(7)
    rows = [
        (f"u{i:04d}", "common filler text", [float(x) for x in rng.normal(size=4)])
        for i in range(n)
    ]
    pdf = pd.DataFrame(rows, columns=["uniqueId", "content", "vec"])
    tables = build_index(spark.createDataFrame(pdf), _cfg("vbig"), stored_cols=("vec",)).persist()
    try:
        eng = SearchEngine(tables)
        req = SearchRequest((C("SCORE_SHOULD", q="common", qf=("content",)),), amount=10)

        # patch the CONCRETE DataFrame class (pyspark 4 dispatches
        # pyspark.sql.DataFrame to a classic/connect subclass)
        SparkDF = type(tables.doc_map)
        sizes = []
        orig = SparkDF.collect

        def spy(self):
            out = orig(self)
            sizes.append(len(out))
            return out

        monkeypatch.setattr(SparkDF, "collect", spy)
        res = eng.search_vector(req, [1.0, 0.0, 0.0, 0.0], "vec", k=10, should=True, amount=10)
        monkeypatch.setattr(SparkDF, "collect", orig)

        assert res["totalHits"] == n
        assert len(res["topk"]) == 10
        assert sizes, "expected at least the page collect"
        assert max(sizes) <= 10, f"driver collected {max(sizes)} rows (match set leak)"
    finally:
        tables.unpersist()


def test_get_terms_extras(engine):
    rows = {r["term"]: (r["df"], r["ttf"]) for r in engine.get_terms("content").collect()}
    assert rows["beta"] == (2, 3)
    inc = [r["term"] for r in engine.get_terms("content", include_terms=("alpha", "beta")).collect()]
    assert inc == ["alpha", "beta"]
    mtf = [r["term"] for r in engine.get_terms("content", min_term_freq=3).collect()]
    assert mtf == ["alpha", "beta"]
    fz = [r["term"] for r in engine.get_terms("content", fuzzy_term=("bета", 2)).collect()]
    # cyrillic lookalikes are >2 edits away; use a latin near-miss
    fz2 = [r["term"] for r in engine.get_terms("content", fuzzy_term=("betas", 1)).collect()]
    assert "beta" in fz2

"""Query-string parser: AST shape (QueryParserTest.java as spec) and
end-to-end execution through the kernel tree evaluator."""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.parser import (
    Bool,
    Leaf,
    ParseError,
    Range,
    parse_query,
)
from zuliasearch_spark.search.query import SearchRequest

# ---------------------------------------------------------------------------
# AST shape (mirrors QueryParserTest.minimumShouldMatchTest occurs)


def occurs(node):
    return [o for o, _ in node.children]


def test_mm_group_occurs_or_default():
    # "abstract:diabetes title:(cancer AND lung -fly rat bear insect +fruit)@2"
    # → abstract:diabetes ((+cancer +lung -fly rat bear insect +fruit)~2)
    q = parse_query("abstract:diabetes title:(cancer AND lung -fly rat bear insect +fruit)@2")
    assert occurs(q) == ["SHOULD", "SHOULD"]
    grp = q.children[1][1]
    assert isinstance(grp, Bool) and grp.mm == 2
    assert occurs(grp) == ["MUST", "MUST", "MUST_NOT", "SHOULD", "SHOULD", "SHOULD", "MUST"]
    assert all(c.field == "title" for _, c in grp.children)


def test_mm_group_tilde_syntax_same():
    a = parse_query("t:(cancer AND lung -fly rat +fruit)@2")
    b = parse_query("t:(cancer AND lung -fly rat +fruit)~2")
    assert occurs(a.children[0][1]) == occurs(b.children[0][1])
    assert a.children[0][1].mm == b.children[0][1].mm == 2


def test_default_and_promotes_bare_terms():
    q = parse_query("cancer lung OR fly", default_op="AND")
    # AND default: bare terms MUST; explicit OR demotes both sides
    assert occurs(q) == ["MUST", "SHOULD", "SHOULD"]


def test_and_promotes_previous():
    q = parse_query("a b AND c")
    assert occurs(q) == ["SHOULD", "MUST", "MUST"]


def test_not_and_bang():
    q = parse_query("a NOT b !c -d")
    assert occurs(q) == ["SHOULD", "MUST_NOT", "MUST_NOT", "MUST_NOT"]


def test_nested_groups():
    q = parse_query("(a OR b) AND c")
    assert occurs(q) == ["MUST", "MUST"]
    inner = q.children[0][1]
    assert isinstance(inner, Bool) and occurs(inner) == ["SHOULD", "SHOULD"]


def test_phrase_slop_fuzzy_boost_regex():
    q = parse_query('"exact phrase"~3 term~ wild* /reg.x/ a:b^2.5')
    ph = q.children[0][1]
    assert ph.phrase and ph.slop == 3 and ph.text == "exact phrase"
    fz = q.children[1][1]
    assert fz.fuzzy == 2  # bare ~ → 2 edits
    assert q.children[2][1].text == "wild*"
    assert q.children[3][1].regex
    assert q.children[4][1].boost == 2.5


def test_ranges_and_comparisons():
    q = parse_query("n:[10 TO 50] m:{a TO b} ts:[2024-06-17T16:10:00 TO *] k>=5 j<3 i=7")
    r0 = q.children[0][1]
    assert isinstance(r0, Range) and (r0.lo, r0.hi, r0.incl_lo, r0.incl_hi) == ("10", "50", True, True)
    r1 = q.children[1][1]
    assert (r1.lo, r1.hi, r1.incl_lo, r1.incl_hi) == ("a", "b", False, False)
    r2 = q.children[2][1]
    assert r2.lo == "2024-06-17T16:10:00" and r2.hi is None
    assert q.children[3][1].lo == "5" and q.children[3][1].incl_lo
    assert q.children[4][1].hi == "3" and not q.children[4][1].incl_hi
    assert q.children[5][1].lo == "7" and q.children[5][1].hi == "7"


def test_field_group_scoping_and_exists():
    q = parse_query("f:(a b) g:*")
    grp = q.children[0][1]
    assert all(c.field == "f" for _, c in grp.children)
    assert q.children[1][1].text == "*" and q.children[1][1].field == "g"


def test_length_meta_fields():
    from zuliasearch_spark.search.parser import _meta_field

    assert _meta_field("|content|") == "_zcl_content"
    assert _meta_field("|||tags|||") == "_zll_tags"
    assert _meta_field("plain") == "plain"
    q = parse_query("|content|:[10 TO 50] |||tags|||>=2")
    assert isinstance(q.children[0][1], Range) and q.children[0][1].field == "|content|"
    assert q.children[1][1].field == "|||tags|||"


def test_escapes():
    q = parse_query(r"added:2024\:06\:17 pa\-th:x")
    assert q.children[0][1].field == "added" and q.children[0][1].text == "2024:06:17"


def test_parse_errors():
    for bad in ["", "(a", "a)", "f:[1 TO", "^2"]:
        with pytest.raises(ParseError):
            parse_query(bad)


# ---------------------------------------------------------------------------
# end-to-end through the engine

DOCS = [
    ("d00", "alpha beta gamma", "en", 10),
    ("d01", "alpha beta", "en", 20),
    ("d02", "beta gamma", "fr", 30),
    ("d03", "alpha", "fr", 40),
    ("d04", "gamma delta", "en", 50),
    ("d05", "delta epsilon", "de", 60),
    ("d06", "alphabet soup", "fr", 70),
    ("d07", "epsilon", "en", 80),
    ("d08", "alpha alpha beta", "de", 90),
    ("d09", "", "fr", 100),
]


@pytest.fixture(scope="module")
def engine(spark):
    cfg = IndexConfig(
        index_name="qs",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
        ),
        per_shard_stats=False,
        quantize_norms=False,
    )
    pdf = pd.DataFrame(DOCS, columns=["uniqueId", "content", "lang", "n"])
    tables = build_index(
        spark.createDataFrame(pdf), cfg, stored_cols=("n", "lang")
    ).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def _ids(res):
    return {t["uniqueId"] for t in res["topk"]}


def _q(engine, q, **kw):
    return engine.search(SearchRequest(qs=q, amount=50, **kw))


def test_qs_bool(engine):
    assert _ids(_q(engine, "alpha AND beta")) == {"d00", "d01", "d08"}
    assert _ids(_q(engine, "alpha -beta")) == {"d03"}
    assert _ids(_q(engine, "(alpha OR delta) AND gamma")) == {"d00", "d04"}
    assert _ids(_q(engine, "alpha beta", default_op="AND")) == {"d00", "d01", "d08"}
    assert _ids(_q(engine, "lang:fr alpha", default_op="AND")) == {"d03"}


def test_qs_mm_group(engine):
    assert _ids(_q(engine, "(alpha beta gamma)~2")) == {"d00", "d01", "d02", "d08"}


def test_qs_phrase_and_wildcard(engine):
    assert _ids(_q(engine, '"alpha beta"')) == {"d00", "d01", "d08"}
    # wildcard alph* covers alpha + alphabet
    assert _ids(_q(engine, "alph*")) == {"d00", "d01", "d03", "d06", "d08"}
    # fuzzy alpa~1 → alpha
    assert _ids(_q(engine, "alpa~1")) == {"d00", "d01", "d03", "d08"}


def test_qs_exists(engine):
    # content:* matches every NON-NULL content — including d09's ""
    # (NullEmptyTest: an empty value is a present field); content:*?
    # needs at least one character, so it drops d09
    res = _q(engine, "content:*")
    assert _ids(res) == {f"d0{i}" for i in range(10)}
    assert res["totalHits"] == 10
    res = _q(engine, "content:*?")
    assert _ids(res) == {f"d0{i}" for i in range(9)}
    assert res["totalHits"] == 9


def test_qs_negative_only_fixup(engine):
    res = _q(engine, "-alpha")
    assert _ids(res) == {"d02", "d04", "d05", "d06", "d07", "d09"}


def test_qs_boost_changes_ranking(engine):
    plain = engine.search(SearchRequest(qs="alpha epsilon", amount=3))
    boosted = engine.search(SearchRequest(qs="alpha^20 epsilon", amount=3))
    s_plain = {t["uniqueId"]: t["score"] for t in plain["topk"]}
    s_boost = {t["uniqueId"]: t["score"] for t in boosted["topk"]}
    assert s_plain != s_boost
    # an alpha-only doc overtakes the epsilon docs under the boost
    assert boosted["topk"][0]["uniqueId"] in {"d03", "d08", "d01", "d00"}


def test_search_string_ranges(engine):
    res = engine.search_string("alpha AND n:[15 TO 45]", amount=50)
    assert {t["uniqueId"] for t in res["topk"]} == {"d01", "d03"}
    assert res["totalHits"] == 2
    # pure range query (no term leaves)
    res2 = engine.search_string("n:[85 TO *]", amount=50)
    assert {t["uniqueId"] for t in res2["topk"]} == {"d08", "d09"}
    # string range over a keyword column
    res3 = engine.search_string("alpha AND lang:[en TO en]", amount=50)
    assert {t["uniqueId"] for t in res3["topk"]} == {"d00", "d01"}
    # NOT range
    res4 = engine.search_string("alpha -n:[15 TO 95]", amount=50)
    assert {t["uniqueId"] for t in res4["topk"]} == {"d00"}


INTERVAL_DOCS = [
    ("i0", "alpha x beta"),         # ordered, gap 1
    ("i1", "beta x alpha"),         # reversed
    ("i2", "alpha beta"),           # adjacent ordered
    ("i3", "alpha x y z z z beta"), # ordered, gap 5
    ("i4", "alpha"),                # missing beta
]


def test_intervals_end_to_end(spark):
    cfg = IndexConfig(
        index_name="iv",
        unique_id_col="uniqueId",
        number_of_shards=1,
        default_search_fields=("content",),
        field_configs=(FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),),
        per_shard_stats=False,
        quantize_norms=False,
    )
    pdf = pd.DataFrame(INTERVAL_DOCS, columns=["uniqueId", "content"])
    from zuliasearch_spark.indexing.builder import build_index as _bi

    tables = _bi(spark.createDataFrame(pdf), cfg).persist()
    try:
        eng = SearchEngine(tables)

        def ids(q):
            return {t["uniqueId"] for t in eng.search(SearchRequest(qs=q, amount=10))["topk"]}

        assert ids("fn:ordered(alpha beta)") == {"i0", "i2", "i3"}
        assert ids("fn:unordered(alpha beta)") == {"i0", "i1", "i2", "i3"}
        assert ids("fn:ordered(alpha beta)~1") == {"i0", "i2"}  # maxgaps 1
        assert ids("fn:ordered(alpha beta)~0") == {"i2"}
        assert ids("fn:unordered(alpha beta)~1") == {"i0", "i1", "i2"}
        # composes with booleans
        assert ids("fn:ordered(alpha beta) -x") == {"i2"}
        # fn:phrase = ordered + consecutive (maxgaps 0)
        assert ids("fn:phrase(alpha beta)") == {"i2"}
        # fn:or = any source present
        assert ids("fn:or(beta z)") == {"i0", "i1", "i2", "i3"}
        # fn:before / fn:after — two-source order constraints
        assert ids("fn:before(alpha beta)") == {"i0", "i2", "i3"}
        assert ids("fn:after(beta alpha)") == {"i0", "i2", "i3"}
        assert ids("fn:after(alpha beta)") == {"i1"}
    finally:
        tables.unpersist()


def test_length_meta_end_to_end(spark):
    from dataclasses import replace as _rep

    cfg = IndexConfig(
        index_name="lm",
        unique_id_col="uniqueId",
        number_of_shards=1,
        default_search_fields=("content",),
        field_configs=(FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),),
        per_shard_stats=False,
        quantize_norms=False,
        store_length_meta=True,
    )
    pdf = pd.DataFrame(
        [("m0", "aa"), ("m1", "bbbb cc"), ("m2", "dddddddddd")],
        columns=["uniqueId", "content"],
    )
    from zuliasearch_spark.indexing.builder import build_index as _bi

    tables = _bi(spark.createDataFrame(pdf), cfg).persist()
    try:
        eng = SearchEngine(tables)
        assert "_zcl_content" in tables.doc_map.columns
        res = eng.search_string("|content|:[3 TO 8]", amount=10)
        assert {t["uniqueId"] for t in res["topk"]} == {"m1"}
        res2 = eng.search_string("|||content|||:[1 TO 1]", amount=10)
        assert res2["totalHits"] == 3  # scalar column: list length 1
    finally:
        tables.unpersist()


def test_qs_matches_clause_model_scores(engine):
    from zuliasearch_spark.search.query import QueryClause as C

    a = engine.search(SearchRequest(qs="alpha beta", amount=50))
    b = engine.search(
        SearchRequest(clauses=(C("SCORE_SHOULD", q="alpha beta", qf=("content",)),), amount=50)
    )
    sa = {t["uniqueId"]: t["score"] for t in a["topk"]}
    sb = {t["uniqueId"]: t["score"] for t in b["topk"]}
    assert sa == sb


def test_zl_set_nodes_parse():
    from zuliasearch_spark.search.parser import ParseError, ZlSet, parse_query

    root = parse_query("n:zl:ns(1 2 3)")
    _, node = root.children[0]
    assert isinstance(node, ZlSet) and node.kind == "ns"
    assert node.field == "n" and node.values == ("1", "2", "3")

    root = parse_query('lang:zl:termQuery(en "de at")^2')
    _, node = root.children[0]
    assert node.kind == "tq" and node.values == ("en", "de at") and node.boost == 2.0

    root = parse_query("n:zl:numericSet(-5 7)")
    _, node = root.children[0]
    assert node.values == ("-5", "7")

    import pytest as _pytest

    with _pytest.raises(ParseError):
        parse_query("zl:ns(1 2)")  # field required
    with _pytest.raises(ParseError):
        parse_query("n:zl:bogus(1)")
    with _pytest.raises(ParseError):
        parse_query("n:zl:ns()")


def test_zl_set_nodes_end_to_end(spark):
    """zl:ns + zl:tq composed with scored terms, including the
    doc-values path (ns strips to a predicate; tq evaluates in the
    candidate-subset kernel) and Lucene-style NULL-safe MUST_NOT."""
    import pandas as pd

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing.builder import build_index

    docs = [
        ("d0", "alpha beta", "en", 7),
        ("d1", "beta gamma", "fr", 9),
        ("d2", "alpha delta", "de", 11),
        ("d3", "epsilon beta", "en", None),
    ]
    cfg = IndexConfig(
        index_name="zlp",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),)),
        ),
    )
    pdf = pd.DataFrame(docs, columns=["uniqueId", "content", "lang", "n"])
    pdf["n"] = pdf["n"].astype("Int64")
    tables = build_index(spark.createDataFrame(pdf), cfg, stored_cols=("lang", "n")).persist()
    try:
        eng = SearchEngine(tables)

        def ids(qs):
            return sorted(t["uniqueId"] for t in eng.search_string(qs, amount=10)["topk"])

        assert ids("content:zl:tq(alpha epsilon)") == ["d0", "d2", "d3"]
        # ns predicate + tq inside the stripped tree → subset kernel
        assert ids("n:zl:ns(7 9 11) AND lang:zl:tq(en fr)") == ["d0", "d1"]
        # MUST_NOT ns keeps the NULL-n doc
        assert ids("content:beta AND NOT n:zl:ns(7 9)") == ["d3"]
        # boost applies per-clause
        res = eng.search_string("content:zl:tq(alpha)^3 OR content:gamma", amount=10)
        by = {t["uniqueId"]: t["score"] for t in res["topk"]}
        assert by["d0"] == pytest.approx(3.0) and by["d2"] == pytest.approx(3.0)
    finally:
        tables.unpersist()


def test_mm_group_forces_or_regardless_of_default_op():
    """QueryParserTest.minimumShouldMatchTest: inside a (…)~N / (…)@N
    group, implicit whitespace terms stay SHOULD even under default
    AND (ZuliaMinMatchOrHandlingProcessor) while explicit AND pairs
    and +/- keep their occur — the parse is identical under both
    default operators."""
    from zuliasearch_spark.search.parser import MUST, MUST_NOT, SHOULD, parse_query

    def inner_occurs(q, op):
        root = parse_query(q, op)
        grp = root.children[1][1]
        return [(o, c.text) for o, c in grp.children], grp.mm

    for q in (
        "abstract:diabetes title:(cancer AND lung -fly rat bear insect +fruit)@2",
        "abstract:diabetes title:(cancer AND lung -fly rat bear insect +fruit)~2",
    ):
        want = (
            [(MUST, "cancer"), (MUST, "lung"), (MUST_NOT, "fly"),
             (SHOULD, "rat"), (SHOULD, "bear"), (SHOULD, "insect"),
             (MUST, "fruit")],
            2,
        )
        assert inner_occurs(q, "OR") == want
        assert inner_occurs(q, "AND") == want
    # top level still honors the default operator
    root_or = parse_query(
        "abstract:diabetes title:(cancer AND lung rat)~2", "OR"
    )
    root_and = parse_query(
        "abstract:diabetes title:(cancer AND lung rat)~2", "AND"
    )
    assert [o for o, _ in root_or.children] == [SHOULD, SHOULD]
    assert [o for o, _ in root_and.children] == [MUST, MUST]


def test_global_mm_forces_or_regardless_of_default_op():
    """QueryParserTest global setMinimumNumberShouldMatch(2): bare
    terms stay optional under BOTH default operators; explicit
    AND/+/- survive (ZuliaGlobalMinMatchProcessor wrap + rewrite)."""
    from zuliasearch_spark.search.parser import (
        MUST,
        MUST_NOT,
        SHOULD,
        apply_global_mm,
        parse_query,
    )

    q = "cancer AND lung -fly rat bear insect +fruit dragon"
    want = [
        (MUST, "cancer"), (MUST, "lung"), (MUST_NOT, "fly"),
        (SHOULD, "rat"), (SHOULD, "bear"), (SHOULD, "insect"),
        (MUST, "fruit"), (SHOULD, "dragon"),
    ]
    for op in ("OR", "AND"):
        root = apply_global_mm(parse_query(q, op), 2)
        assert [(o, c.text) for o, c in root.children] == want
        assert root.mm == 2
    # mm=1 is not wrapped (reference only wraps when mm > 1): default
    # AND keeps bare terms required
    root = apply_global_mm(parse_query("a b", "AND"), 1)
    assert [o for o, _ in root.children] == [MUST, MUST]

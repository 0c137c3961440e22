"""Nested interval functions (ZuliaSyntaxParser.jj:477-789 — the
Function-state grammar) — evaluator vs a definitional brute-force
oracle, parser coverage for all 19 functions, and end-to-end
search_string() checks on a positional index."""

from itertools import combinations, product

import numpy as np
import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.intervals import ISrc, _minimalize, eval_tree
from zuliasearch_spark.search.parser import ParseError, parse_query, Interval


# ---------------------------------------------------------------------------
# brute-force oracle: enumerate every matching interval by definition,
# then reduce to the minimal set (the stream semantics)


def brute(node: ISrc, pos_of):
    k = node.kind
    if k == "term":
        return [(int(p), int(p)) for p in pos_of.get(node.term, ())]
    if k == "none":
        return []
    if k == "or":
        out = []
        for c in node.children:
            out.extend(brute(c, pos_of))
        return _min2(out)
    if k in ("ordered", "unordered", "phrase"):
        kids = [brute(c, pos_of) for c in node.children]
        if any(not c for c in kids):
            return []
        out = []
        for combo in product(*kids):
            if k == "ordered":
                if all(combo[i + 1][0] > combo[i][1] for i in range(len(combo) - 1)):
                    out.append((combo[0][0], combo[-1][1]))
            elif k == "phrase":
                if all(combo[i + 1][0] == combo[i][1] + 1 for i in range(len(combo) - 1)):
                    out.append((combo[0][0], combo[-1][1]))
            else:
                out.append((min(c[0] for c in combo), max(c[1] for c in combo)))
        return _min2(out)
    if k == "unordered_no_overlaps":
        a, b = (brute(c, pos_of) for c in node.children)
        out = [
            (min(x[0], y[0]), max(x[1], y[1]))
            for x in a
            for y in b
            if x[1] < y[0] or y[1] < x[0]
        ]
        return _min2(out)
    if k == "atleast":
        present = [c for c in (brute(ch, pos_of) for ch in node.children) if c]
        if len(present) < node.n or node.n <= 0:
            return []
        out = []
        for subset in combinations(present, node.n):
            for combo in product(*subset):
                out.append((min(c[0] for c in combo), max(c[1] for c in combo)))
        return _min2(out)
    if k == "maxwidth":
        return [iv for iv in brute(node.children[0], pos_of) if iv[1] - iv[0] + 1 <= node.n]
    if k == "extend":
        return _min2(
            [(max(0, s - node.n), e + node.n2) for s, e in brute(node.children[0], pos_of)]
        )
    a = brute(node.children[0], pos_of)
    b = brute(node.children[1], pos_of)
    if k in ("within", "not_within"):
        b = _min2([(max(0, s - node.n), e + node.n) for s, e in b])
    if k == "before":
        return [iv for iv in a if any(iv[1] < bb[0] for bb in b)]
    if k == "after":
        return [iv for iv in a if any(iv[0] > bb[1] for bb in b)]
    if k == "containing":
        return [iv for iv in a if any(iv[0] <= bb[0] and bb[1] <= iv[1] for bb in b)]
    if k == "not_containing":
        return [iv for iv in a if not any(iv[0] <= bb[0] and bb[1] <= iv[1] for bb in b)]
    if k in ("contained_by", "within"):
        return [iv for iv in a if any(bb[0] <= iv[0] and iv[1] <= bb[1] for bb in b)]
    if k in ("not_contained_by", "not_within"):
        return [iv for iv in a if not any(bb[0] <= iv[0] and iv[1] <= bb[1] for bb in b)]
    if k == "overlapping":
        return [iv for iv in a if any(iv[0] <= bb[1] and bb[0] <= iv[1] for bb in b)]
    if k == "non_overlapping":
        return [iv for iv in a if not any(iv[0] <= bb[1] and bb[0] <= iv[1] for bb in b)]
    raise ValueError(k)


def _min2(ivs):
    return [(s, e) for s, e, _ in _minimalize([(s, e, 0) for s, e in ivs])]


def _se(ivs):
    return [(s, e) for s, e, _ in ivs]


T = lambda t: ISrc("term", term=t)  # noqa: E731


def _random_pos(rng, terms, n_tokens):
    doc = rng.choice(terms, size=n_tokens)
    return {t: np.flatnonzero(doc == t) for t in set(doc)}


NODES = [
    ISrc("ordered", (T("a"), T("b"))),
    ISrc("ordered", (T("a"), T("b"), T("c"))),
    ISrc("unordered", (T("a"), T("b"), T("c"))),
    ISrc("phrase", (T("a"), T("b"))),
    ISrc("or", (T("a"), ISrc("phrase", (T("b"), T("c"))))),
    ISrc("atleast", (T("a"), T("b"), T("c"), T("d")), n=2),
    ISrc("maxwidth", (ISrc("unordered", (T("a"), T("b"))),), n=3),
    ISrc("extend", (T("a"),), n=1, n2=2),
    ISrc("before", (T("a"), T("b"))),
    ISrc("after", (T("a"), T("b"))),
    ISrc("containing", (ISrc("unordered", (T("a"), T("b"))), T("c"))),
    ISrc("not_containing", (ISrc("unordered", (T("a"), T("b"))), T("c"))),
    ISrc("contained_by", (T("c"), ISrc("unordered", (T("a"), T("b"))))),
    ISrc("not_contained_by", (T("c"), ISrc("unordered", (T("a"), T("b"))))),
    ISrc("within", (T("c"), ISrc("ordered", (T("a"), T("b")))), n=2),
    ISrc("not_within", (T("c"), ISrc("ordered", (T("a"), T("b")))), n=2),
    ISrc("overlapping", (ISrc("unordered", (T("a"), T("b"))), T("c"))),
    ISrc("non_overlapping", (ISrc("unordered", (T("a"), T("b"))), T("c"))),
    ISrc("unordered_no_overlaps", (ISrc("unordered", (T("a"), T("b"))), T("c"))),
]


@pytest.mark.parametrize("node", NODES, ids=lambda n: n.kind)
def test_eval_matches_bruteforce(node):
    """Evaluator minimal intervals == definitional enumeration +
    minimalization, over 60 random small documents."""
    rng = np.random.default_rng(42)
    terms = np.array(["a", "b", "c", "d", "x"])
    for _ in range(60):
        pos_of = _random_pos(rng, terms, int(rng.integers(1, 14)))
        got = _se(eval_tree(node, pos_of))
        want = brute(node, pos_of)
        assert got == want, f"{node.kind}: {got} != {want} on {pos_of}"


def test_maxgaps_flat_terms():
    """gaps of term-children ordered/unordered = width − k (the flat
    contract the existing fn:…~N suffix relies on)."""
    rng = np.random.default_rng(7)
    terms = np.array(["a", "b", "c", "x"])
    node = ISrc("ordered", (T("a"), T("b"), T("c")))
    for _ in range(40):
        pos_of = _random_pos(rng, terms, int(rng.integers(3, 14)))
        for s, e, g in eval_tree(node, pos_of):
            assert g == (e - s + 1) - 3
    for n in (0, 1, 3):
        filt = ISrc("maxgaps", (node,), n=n)
        for _ in range(20):
            pos_of = _random_pos(rng, terms, int(rng.integers(3, 14)))
            got = _se(eval_tree(filt, pos_of))
            want = [(s, e) for s, e in brute(node, pos_of) if (e - s + 1) - 3 <= n]
            assert got == want


# ---------------------------------------------------------------------------
# parser coverage (mirrors ZuliaSyntaxParser.jj:486-512 dispatcher)

ALL_FN_QUERIES = {
    "ordered": "fn:ordered(a b c)",
    "unordered": "fn:unordered(a b)",
    "unordered_no_overlaps": "fn:unorderedNoOverlaps(a b)",
    "or": "fn:or(fn:phrase(a b) c)",
    "phrase": "fn:phrase(fn:or(a b) c)",
    "atleast": "fn:atLeast(2 a b c)",
    "maxgaps": "fn:maxgaps(2 fn:ordered(a b))",
    "maxwidth": "fn:maxwidth(5 fn:unordered(a b))",
    "before": "fn:before(fn:ordered(a b) c)",
    "after": "fn:after(fn:ordered(a b) c)",
    "containing": "fn:containing(fn:unordered(a b) c)",
    "not_containing": "fn:notContaining(fn:unordered(a b) c)",
    "contained_by": "fn:containedBy(a fn:unordered(b c))",
    "not_contained_by": "fn:notContainedBy(a fn:unordered(b c))",
    "within": "fn:within(a 3 fn:ordered(b c))",
    "not_within": "fn:notWithin(a 3 b)",
    "overlapping": "fn:overlapping(fn:unordered(a b) c)",
    "non_overlapping": "fn:nonOverlapping(fn:unordered(a b) c)",
    "extend": "fn:extend(a 1 2)",
    "wildcard": "fn:ordered(fn:wildcard(al*) b)",
    "fuzzy": "fn:ordered(fn:fuzzyTerm(alpha 1) b)",
}


@pytest.mark.parametrize("kind", sorted(ALL_FN_QUERIES), ids=str)
def test_parser_all_interval_functions(kind):
    root = parse_query(ALL_FN_QUERIES[kind])
    _, node = root.children[0]
    assert isinstance(node, Interval)
    if kind in ("ordered", "unordered"):
        # single-level term-only keeps the legacy flat shape
        assert node.tree is None
    else:
        assert node.tree is not None


def test_parser_interval_errors():
    for bad in (
        "fn:bogus(a b)",
        "fn:within(a b c)",  # missing the N
        "fn:maxgaps(x fn:ordered(a b))",
        "fn:extend(a 1)",  # needs two numbers
        "fn:ordered(a b",  # unterminated
    ):
        with pytest.raises(ParseError):
            parse_query(bad)


def test_parser_field_scoped_and_suffix():
    root = parse_query("content:fn:within(a 1 fn:ordered(b c))")
    _, node = root.children[0]
    assert isinstance(node, Interval) and node.field == "content"
    root = parse_query("fn:within(a 1 fn:ordered(b c))~2")
    _, node = root.children[0]
    assert node.tree.kind == "maxgaps" and node.tree.n == 2


# ---------------------------------------------------------------------------
# end-to-end through the engine


@pytest.fixture(scope="module")
def iv_engine(spark):
    docs = [
        ("d0", "alpha beta gamma delta"),
        ("d1", "alpha gamma beta zeta"),
        ("d2", "beta alpha alpha beta gamma"),
        ("d3", "gamma delta epsilon"),
        ("d4", "alpha beta"),
    ]
    cfg = IndexConfig(
        index_name="iv",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(docs, columns=["uniqueId", "content"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    yield SearchEngine(tables)
    tables.unpersist()


E2E_CASES = [
    ("fn:within(alpha 1 fn:phrase(beta gamma))", ["d0", "d2"]),
    ("fn:containing(fn:unordered(alpha gamma) beta)", ["d0", "d2"]),
    ("fn:atLeast(2 alpha delta zeta)", ["d0", "d1"]),
    ("fn:maxwidth(2 fn:unordered(alpha gamma))", ["d1"]),
    # every minimal ordered(alpha, beta) interval starts at an alpha,
    # so notContaining(..., alpha) is empty by construction
    ("fn:notContaining(fn:ordered(alpha beta) alpha)", []),
    ("fn:ordered(fn:wildcard(al*) gamma)", ["d0", "d1", "d2"]),
    ("fn:ordered(fn:fuzzyTerm(alphq 1) beta)", ["d0", "d1", "d2", "d4"]),
    ("fn:overlapping(fn:extend(delta 1 0) gamma)", ["d0", "d3"]),
    # d0: alpha@0 outside the (1,2) beta/gamma window; d4 has no
    # gamma at all so nothing can contain its alphas
    ("fn:notContainedBy(alpha fn:unordered(beta gamma))", ["d0", "d1", "d2", "d4"]),
    # d1's gamma@1 sits inside its only minimal alpha/beta window
    # (0,2), so every pairing overlaps
    ("fn:unorderedNoOverlaps(fn:unordered(alpha beta) gamma)", ["d0", "d2"]),
]


@pytest.mark.parametrize("qs,want", E2E_CASES, ids=[q[:40] for q, _ in E2E_CASES])
def test_interval_e2e(iv_engine, qs, want):
    res = iv_engine.search_string(qs, amount=10)
    got = sorted(t["uniqueId"] for t in res["topk"])
    assert got == want
    assert res["totalHits"] == len(want)

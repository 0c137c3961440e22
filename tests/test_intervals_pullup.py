"""Disjunction pull-up for interval sources (Lucene Intervals.java
pullUpDisjunctions — closing the r3-documented deviation).

An or()-alternative properly containing a shorter alternative is
suppressed by the disjunction's minimal stream, so under plain
minimal-stream semantics it can never seed a block/ordered chain —
``fn:phrase(fn:or(a fn:phrase(a b)) c)`` misses "a b c". Lucene
rewrites the disjunction OUT of positional conjunctions
(OrderedIntervalsSource.build / BlockIntervalsSource.build /
UnorderedIntervalsSource.build via Disjunctions.pullUp) and pulls
through extend / ContainedBy's small side / Containing's big side;
``intervals.pull_up_disjunctions`` mirrors that at parse time.

Oracle: ``bf_alts`` evaluates the PULLED-UP semantics definitionally —
per node it yields one minimal stream per pulled alternative, taking
full Cartesian products over interval tuples (no greedy chaining, no
bisect shortcuts, no tree rewriting), so it shares no mechanism with
either the production rewrite or the production evaluator.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.intervals import ISrc, eval_tree, pull_up_disjunctions

TERMS = ("a", "b", "c", "d")


# ---------------------------------------------------------------- oracle


def bf_min(ivs):
    best = {}
    for s, e, g in ivs:
        if (s, e) not in best or g < best[(s, e)]:
            best[(s, e)] = g
    keys = set(best)
    return sorted(
        (s, e, best[(s, e)])
        for s, e in keys
        if not any((s2, e2) != (s, e) and s2 >= s and e2 <= e for s2, e2 in keys)
    )


def _combine(kind, streams):
    """Definitional positional conjunction over already-minimal child
    streams: full product over interval tuples."""
    if any(not s for s in streams):
        return []
    out = []
    for combo in itertools.product(*streams):
        if kind == "ordered":
            if any(combo[i + 1][0] <= combo[i][1] for i in range(len(combo) - 1)):
                continue
            between = sum(
                combo[i + 1][0] - combo[i][1] - 1 for i in range(len(combo) - 1)
            )
            out.append((combo[0][0], combo[-1][1], between + sum(c[2] for c in combo)))
        elif kind == "phrase":
            if any(combo[i + 1][0] != combo[i][1] + 1 for i in range(len(combo) - 1)):
                continue
            out.append((combo[0][0], combo[-1][1], sum(c[2] for c in combo)))
        else:  # unordered
            lo = min(c[0] for c in combo)
            hi = max(c[1] for c in combo)
            covered = sum(c[1] - c[0] + 1 for c in combo)
            out.append(
                (lo, hi, max(0, hi - lo + 1 - covered) + sum(c[2] for c in combo))
            )
    return bf_min(out)


def bf_alts(node: ISrc, pos_of) -> list[list]:
    """Pulled-up semantics: the node's minimal streams, one per
    disjunctive alternative. The node's overall stream is
    bf_min(concat(bf_alts(node)))."""
    k = node.kind
    if k == "term":
        return [[(int(p), int(p), 0) for p in pos_of.get(node.term, ())]]
    if k == "none":
        return [[]]
    if k == "or":
        out = []
        for c in node.children:
            out.extend(bf_alts(c, pos_of))
        return out
    if k in ("ordered", "phrase", "unordered"):
        return [
            _combine(k, assign)
            for assign in itertools.product(
                *[bf_alts(c, pos_of) for c in node.children]
            )
        ]
    if k == "extend":
        return [
            bf_min([(max(0, s - node.n), e + node.n2, g) for s, e, g in alt])
            for alt in bf_alts(node.children[0], pos_of)
        ]
    if k in ("contained_by", "containing"):
        ref = bf_stream(node.children[1], pos_of)
        if k == "contained_by":
            keep = lambda iv: any(b[0] <= iv[0] and iv[1] <= b[1] for b in ref)
        else:
            keep = lambda iv: any(iv[0] <= b[0] and b[1] <= iv[1] for b in ref)
        return [
            [iv for iv in alt if keep(iv)]
            for alt in bf_alts(node.children[0], pos_of)
        ]
    if k == "maxgaps":
        # filter barrier: alternatives below do NOT pull past it
        return [[iv for iv in bf_stream(node.children[0], pos_of) if iv[2] <= node.n]]
    raise ValueError(k)


def bf_stream(node, pos_of):
    return bf_min([iv for alt in bf_alts(node, pos_of) for iv in alt])


# ------------------------------------------------------------ strategies

leaf = st.sampled_from(TERMS).map(lambda t: ISrc("term", (), term=t))


def _node(children):
    conj = st.sampled_from(["ordered", "phrase", "unordered", "or"]).flatmap(
        lambda k: st.lists(children, min_size=2, max_size=3).map(
            lambda cs: ISrc(k, tuple(cs))
        )
    )
    unary = st.tuples(children, st.integers(0, 2), st.integers(0, 2)).map(
        lambda t: ISrc("extend", (t[0],), n=t[1], n2=t[2])
    )
    gaps = st.tuples(children, st.integers(0, 3)).map(
        lambda t: ISrc("maxgaps", (t[0],), n=t[1])
    )
    two = st.sampled_from(["contained_by", "containing"]).flatmap(
        lambda k: st.tuples(children, children).map(lambda t: ISrc(k, t))
    )
    return st.one_of(conj, unary, gaps, two)


trees = st.recursive(leaf, _node, max_leaves=6)
docs = st.lists(st.sampled_from(TERMS), min_size=0, max_size=10)


@settings(max_examples=300, deadline=None)
@given(trees, docs)
def test_pullup_matches_definitional_oracle(tree, doc):
    pos_of = {}
    for i, t in enumerate(doc):
        pos_of.setdefault(t, []).append(i)
    got = sorted(eval_tree(pull_up_disjunctions(tree, limit=10**9), pos_of))
    assert got == bf_stream(tree, pos_of)


# ------------------------------------------------------- canonical cases


def _pos(doc):
    out = {}
    for i, t in enumerate(doc.split()):
        out.setdefault(t, []).append(i)
    return out


CANONICAL = ISrc(
    "phrase",
    (
        ISrc(
            "or",
            (
                ISrc("term", term="a"),
                ISrc("phrase", (ISrc("term", term="a"), ISrc("term", term="b"))),
            ),
        ),
        ISrc("term", term="c"),
    ),
)


def test_canonical_divergence_case():
    """phrase(or(a, phrase(a b)), c) over "a b c": minimal-stream
    semantics suppress the (0,1) alternative (it contains a@0) so the
    block fails; Lucene's pull-up evaluates phrase(phrase(a b), c)
    separately and matches — the doc-level deviation r3 documented."""
    pos = _pos("a b c")
    assert eval_tree(CANONICAL, pos) == []
    assert eval_tree(pull_up_disjunctions(CANONICAL), pos) == [(0, 2, 0)]


def test_containing_big_side_pullup():
    """containing(or(a, phrase(a b)), b) over "a b": the (0,1)
    alternative is the only one containing b@1 but minimalization
    drops it; big-side pull-up recovers the match."""
    t = ISrc(
        "containing",
        (
            ISrc(
                "or",
                (
                    ISrc("term", term="a"),
                    ISrc("phrase", (ISrc("term", term="a"), ISrc("term", term="b"))),
                ),
            ),
            ISrc("term", term="b"),
        ),
    )
    pos = _pos("a b")
    assert eval_tree(t, pos) == []
    assert eval_tree(pull_up_disjunctions(t), pos) == [(0, 1, 0)]


def test_maxgaps_is_a_barrier():
    """maxgaps keeps filtering the disjunction's minimal stream
    (FilteredIntervalsSource.pullUpDisjunctions is singleton): the
    or stays INSIDE the filter after rewrite."""
    t = ISrc(
        "maxgaps",
        (
            ISrc(
                "ordered",
                (
                    ISrc("term", term="a"),
                    ISrc("or", (ISrc("term", term="b"), ISrc("term", term="c"))),
                ),
            ),
        ),
        n=1,
    )
    r = pull_up_disjunctions(t)
    assert r.kind == "maxgaps" and r.children[0].kind == "or"
    assert all(c.kind == "ordered" for c in r.children[0].children)


def test_fanout_cap_skips_rewrite():
    big_or = ISrc("or", tuple(ISrc("term", term=f"t{i}") for i in range(9)))
    t = ISrc("ordered", (ISrc("term", term="a"), big_or, big_or))
    capped = pull_up_disjunctions(t, limit=64)  # 81 variants > 64
    assert capped.kind == "ordered"
    full = pull_up_disjunctions(t, limit=100)
    assert full.kind == "or" and len(full.children) == 81


# ------------------------------------------------------------ end-to-end


@pytest.fixture(scope="module")
def engine(spark):
    rows = [
        ("d0", "apple berry cherry"),  # pull-up block match
        ("d1", "apple cherry"),  # short alternative: phrase(apple, cherry)
        ("d2", "berry cherry apple"),
        ("d3", "apple berry x cherry"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["uid", "body"]))
    cfg = IndexConfig(
        index_name="ivpull",
        unique_id_col="uid",
        number_of_shards=1,
        default_search_fields=("body",),
        field_configs=(
            FieldConfig("body", index_as=(IndexAs("body", "whitespace_lc"),)),
        ),
    )
    tables = build_index(df, cfg, stored_cols=("body",))
    return SearchEngine(tables)


def test_search_string_applies_pullup(engine):
    """End-to-end: the parser rewrites the resolved source tree, so
    the nested-or block matches both the long-alternative doc (d0 via
    phrase(phrase(apple berry), cherry)) and the short one (d1 via
    phrase(apple, cherry)). Without pull-up, d0 misses: the or()'s
    minimal stream drops the (0,1) block because it contains apple@0."""
    res = engine.search_string(
        "fn:phrase(fn:or(apple fn:phrase(apple berry)) cherry)", amount=10
    )
    assert sorted(t["uniqueId"] for t in res["topk"]) == ["d0", "d1"]
    assert res["totalHits"] == 2

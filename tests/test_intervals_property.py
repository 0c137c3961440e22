"""Property tests for the minimal-interval evaluator.

Cross-checks ``search.intervals.eval_tree`` — sweep/bisect-based
minimal-interval streams (Lucene ``Intervals.*`` semantics,
ZuliaSyntaxParser.jj:477-789) — against a brute-force oracle that
enumerates every candidate tuple by Cartesian product and applies the
documented set definitions directly. The production evaluator's
correctness rests on minimal-form invariants (strictly increasing
starts/ends ⇒ single-probe bisect filters are exhaustive); the oracle
assumes none of them, so any sweep/bisect shortcut that drops or
fabricates an interval shows up as a set mismatch.

Runs without Spark (the evaluator is the pure per-doc kernel the
Arrow batch executor applies per candidate doc).
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from zuliasearch_spark.search.intervals import ISrc, eval_tree

TERMS = ("a", "b", "c", "d")


# ---------------------------------------------------------------- oracle


def bf_minimalize(ivs):
    """Spec definition: dedupe (start, end) keeping the smallest gaps,
    then drop every interval that properly contains another candidate.
    (Independent of the evaluator's per-start/reverse-sweep method.)"""
    best = {}
    for s, e, g in ivs:
        if (s, e) not in best or g < best[(s, e)]:
            best[(s, e)] = g
    keys = set(best)
    out = []
    for s, e in keys:
        if any((s2, e2) != (s, e) and s2 >= s and e2 <= e for (s2, e2) in keys):
            continue
        out.append((s, e, best[(s, e)]))
    return sorted(out)


def bf_eval(node: ISrc, pos_of):
    """Brute-force minimal intervals: full Cartesian-product
    enumeration + the documented per-combinator formulas."""
    k = node.kind
    if k == "term":
        pos = pos_of.get(node.term)
        return [] if pos is None else [(int(p), int(p), 0) for p in pos]
    if k == "none":
        return []
    if k == "or":
        cand = []
        for c in node.children:
            cand.extend(bf_eval(c, pos_of))
        return bf_minimalize(cand)
    if k in ("ordered", "phrase", "unordered", "unordered_no_overlaps"):
        kids = [bf_eval(c, pos_of) for c in node.children]
        if any(not c for c in kids):
            return []
        cand = []
        for combo in itertools.product(*kids):
            if k == "ordered":
                if any(combo[i + 1][0] <= combo[i][1] for i in range(len(combo) - 1)):
                    continue
                between = sum(
                    combo[i + 1][0] - combo[i][1] - 1 for i in range(len(combo) - 1)
                )
                cand.append(
                    (combo[0][0], combo[-1][1], between + sum(c[2] for c in combo))
                )
            elif k == "phrase":
                if any(combo[i + 1][0] != combo[i][1] + 1 for i in range(len(combo) - 1)):
                    continue
                cand.append((combo[0][0], combo[-1][1], sum(c[2] for c in combo)))
            elif k == "unordered":
                lo = min(c[0] for c in combo)
                hi = max(c[1] for c in combo)
                covered = sum(c[1] - c[0] + 1 for c in combo)
                cand.append(
                    (lo, hi, max(0, hi - lo + 1 - covered) + sum(c[2] for c in combo))
                )
            else:  # unordered_no_overlaps (binary)
                (sa, ea, ga), (sb, eb, gb) = combo
                if not (ea < sb or eb < sa):
                    continue
                lo, hi = min(sa, sb), max(ea, eb)
                covered = (ea - sa + 1) + (eb - sb + 1)
                cand.append((lo, hi, hi - lo + 1 - covered + ga + gb))
        return bf_minimalize(cand)
    if k == "atleast":
        kids = [bf_eval(c, pos_of) for c in node.children]
        return bf_atleast(kids, node.n)
    if k == "maxgaps":
        return [iv for iv in bf_eval(node.children[0], pos_of) if iv[2] <= node.n]
    if k == "maxwidth":
        return [
            iv
            for iv in bf_eval(node.children[0], pos_of)
            if iv[1] - iv[0] + 1 <= node.n
        ]
    if k == "extend":
        return bf_minimalize(
            [
                (max(0, s - node.n), e + node.n2, g)
                for s, e, g in bf_eval(node.children[0], pos_of)
            ]
        )
    a = bf_eval(node.children[0], pos_of)
    b = bf_eval(node.children[1], pos_of)
    if k in ("within", "not_within"):
        b = bf_minimalize([(max(0, s - node.n), e + node.n, g) for s, e, g in b])
    if k == "before":
        return [iv for iv in a if any(iv[1] < vb[0] for vb in b)]
    if k == "after":
        return [iv for iv in a if any(iv[0] > vb[1] for vb in b)]
    if k == "containing":
        return [iv for iv in a if any(iv[0] <= vb[0] and vb[1] <= iv[1] for vb in b)]
    if k == "not_containing":
        return [
            iv for iv in a if not any(iv[0] <= vb[0] and vb[1] <= iv[1] for vb in b)
        ]
    if k in ("contained_by", "within"):
        return [iv for iv in a if any(vb[0] <= iv[0] and iv[1] <= vb[1] for vb in b)]
    if k in ("not_contained_by", "not_within"):
        return [
            iv for iv in a if not any(vb[0] <= iv[0] and iv[1] <= vb[1] for vb in b)
        ]
    if k == "overlapping":
        return [iv for iv in a if any(vb[0] <= iv[1] and iv[0] <= vb[1] for vb in b)]
    if k == "non_overlapping":
        return [
            iv for iv in a if not any(vb[0] <= iv[1] and iv[0] <= vb[1] for vb in b)
        ]
    raise ValueError(k)


# atleast's oracle combines already-evaluated child streams with the
# inline unordered formula (MinimumShouldMatchIntervalsSource).
def _bf_unordered_streams(streams):
    if any(not c for c in streams):
        return []
    cand = []
    for combo in itertools.product(*streams):
        lo = min(c[0] for c in combo)
        hi = max(c[1] for c in combo)
        covered = sum(c[1] - c[0] + 1 for c in combo)
        cand.append((lo, hi, max(0, hi - lo + 1 - covered) + sum(c[2] for c in combo)))
    return bf_minimalize(cand)


def bf_atleast(children_streams, n):
    present = [c for c in children_streams if c]
    if n <= 0 or len(present) < n:
        return []
    cand = []
    for subset in itertools.combinations(present, n):
        cand.extend(_bf_unordered_streams(list(subset)))
    return bf_minimalize(cand)


# ------------------------------------------------------------ strategies

docs = st.lists(st.sampled_from(TERMS), min_size=0, max_size=10)

terms_leaf = st.sampled_from(TERMS).map(lambda t: ISrc("term", (), term=t))

flat_kinds = st.sampled_from(["ordered", "phrase", "unordered", "or"])


def _build_inner(children_strategy):
    def combine(kind, children, n, n2):
        if kind in ("atleast",):
            return ISrc(kind, tuple(children), n=min(n, len(children)))
        if kind in ("maxgaps", "maxwidth", "extend"):
            return ISrc(kind, (children[0],), n=n, n2=n2)
        if kind in (
            "before",
            "after",
            "containing",
            "not_containing",
            "contained_by",
            "not_contained_by",
            "within",
            "not_within",
            "overlapping",
            "non_overlapping",
            "unordered_no_overlaps",
        ):
            return ISrc(kind, (children[0], children[1 % len(children)]), n=n)
        return ISrc(kind, tuple(children))

    return st.builds(
        combine,
        st.sampled_from(
            [
                "ordered",
                "phrase",
                "unordered",
                "or",
                "atleast",
                "maxgaps",
                "maxwidth",
                "extend",
                "before",
                "after",
                "containing",
                "not_containing",
                "contained_by",
                "not_contained_by",
                "within",
                "not_within",
                "overlapping",
                "non_overlapping",
                "unordered_no_overlaps",
            ]
        ),
        st.lists(children_strategy, min_size=2, max_size=3),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=2),
    )


trees = st.recursive(terms_leaf, _build_inner, max_leaves=5)


def _pos_of(doc):
    out = {}
    for i, t in enumerate(doc):
        out.setdefault(t, []).append(i)
    return out


def _as_sets(ivs):
    return sorted((int(s), int(e), int(g)) for s, e, g in ivs)


def _spans(ivs):
    return sorted((int(s), int(e)) for s, e, _ in ivs)


# ---------------------------------------------------------------- tests


@settings(max_examples=400, deadline=None)
@given(trees, docs)
def test_eval_tree_matches_bruteforce(tree, doc):
    """Interval (start, end, gaps) sets — hence doc-level
    match/no-match AND fn:maxgaps filtering — agree with exhaustive
    enumeration for every combinator nesting."""
    got = eval_tree(tree, _pos_of(doc))
    want = bf_eval(tree, _pos_of(doc))
    assert _as_sets(got) == _as_sets(want), (tree, doc)


@settings(max_examples=400, deadline=None)
@given(st.sampled_from(["ordered", "phrase", "unordered", "or"]),
       st.lists(terms_leaf, min_size=2, max_size=3), docs)
def test_flat_combinators_exact_with_gaps(kind, leaves, doc):
    """Over term leaves the gap counts are part of the contract too
    (fn:maxgaps filters on them): compare (start, end, gaps) exactly."""
    tree = ISrc(kind, tuple(leaves))
    got = eval_tree(tree, _pos_of(doc))
    want = bf_eval(tree, _pos_of(doc))
    assert _as_sets(got) == _as_sets(want), (tree, doc)


@settings(max_examples=300, deadline=None)
@given(trees, docs)
def test_minimal_form_invariant(tree, doc):
    """Whatever the tree, the output is in canonical minimal form:
    strictly increasing starts AND ends (no interval contains another),
    gaps never negative, bounds within the doc's extended range."""
    got = eval_tree(tree, _pos_of(doc))
    starts = [s for s, _, _ in got]
    ends = [e for _, e, _ in got]
    assert starts == sorted(set(starts))
    assert ends == sorted(set(ends))
    assert all(g >= 0 for _, _, g in got)
    assert all(s <= e for s, e, _ in got)


@settings(max_examples=200, deadline=None)
@given(st.lists(terms_leaf, min_size=2, max_size=3),
       st.integers(min_value=1, max_value=3), docs)
def test_atleast_equals_subset_union(leaves, n, doc):
    """fn:atLeast(n, …) ≡ minimal union of unordered() over the
    n-subsets of the children that matched (the reference's
    MinimumShouldMatchIntervalsSource contract)."""
    tree = ISrc("atleast", tuple(leaves), n=n)
    got = eval_tree(tree, _pos_of(doc))
    streams = [bf_eval(c, _pos_of(doc)) for c in leaves]
    want = bf_atleast(streams, n)
    assert _spans(got) == _spans(want)


@settings(max_examples=200, deadline=None)
@given(trees, docs, st.integers(min_value=0, max_value=4))
def test_filter_complement_partition(tree, doc, n):
    """containing/notContaining (and containedBy/within pairs)
    partition the source stream: every source interval lands in
    exactly one side."""
    b = ISrc("term", (), term="b")
    src = eval_tree(tree, _pos_of(doc))
    for pos_kind, neg_kind in (
        ("containing", "not_containing"),
        ("contained_by", "not_contained_by"),
        ("within", "not_within"),
        ("overlapping", "non_overlapping"),
    ):
        pos = eval_tree(ISrc(pos_kind, (tree, b), n=n), _pos_of(doc))
        neg = eval_tree(ISrc(neg_kind, (tree, b), n=n), _pos_of(doc))
        assert sorted(_spans(pos) + _spans(neg)) == _spans(src), (pos_kind, tree, doc)

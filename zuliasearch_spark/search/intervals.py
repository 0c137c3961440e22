"""Minimal-interval evaluation for nested interval functions.

Implements the full interval-source algebra of the reference grammar
(ZuliaSyntaxParser.jj:477-789, wrapping Lucene's ``Intervals.*``
factory semantics): every source yields, per document, the MINIMAL
set of matching intervals (no interval properly containing another),
and combinators operate on those streams.

Representation: a resolved source is an ``ISrc`` tree (built in
``parser.py``); per-doc evaluation takes ``{term: positions}`` and
returns a minimal list of ``(start, end, gaps)`` tuples sorted by
start (starts and ends strictly increasing — the canonical minimal
form). ``gaps`` mirrors Lucene's ``IntervalIterator.gaps()``: the
number of uncovered positions inside the interval, the quantity
``fn:maxgaps`` filters on.

Disjunction pull-up (Lucene ``Intervals.java`` pullUpDisjunctions):
a long or()-alternative suppressed by minimalization could never seed
a block/ordered chain, so Lucene rewrites disjunctions OUT of
positional conjunctions before evaluation —
``ordered(a, or(b, c))`` → ``or(ordered(a, b), ordered(a, c))`` —
and pulls through extend and the positive filter sides
(ContainedBy's small side, Containing's big side,
ExtendedIntervalsSource). ``pull_up_disjunctions`` applies the same
rewrite at parse time (parser._resolve_isrc); the evaluator below
keeps clean minimal-stream semantics per (rewritten) node. Variant
fan-out is capped per node (``_PULL_UP_LIMIT``) the way Lucene's
``Intervals.or(rewrite=false, …)`` escape hatch bounds wildcard-sized
disjunctions — past the cap the node keeps minimal-stream semantics.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from dataclasses import dataclass
from itertools import combinations, product

import numpy as np

# kinds with (source, reference) two-child shape where the reference
# must also be present in the doc for a match to be possible
_NEEDS_BOTH = frozenset(
    ("before", "after", "containing", "contained_by", "within", "overlapping")
)
# kinds where only the first child (minuend) is required
_MINUEND_ONLY = frozenset(
    ("not_containing", "not_contained_by", "not_within", "non_overlapping")
)
_ALL_CHILDREN = frozenset(("ordered", "unordered", "phrase", "unordered_no_overlaps"))
_PASS_THROUGH = frozenset(("maxgaps", "maxwidth", "extend"))


@dataclass(frozen=True)
class ISrc:
    """One interval-source node. ``kind`` ∈ term | none | ordered |
    unordered | unordered_no_overlaps | or | phrase | atleast |
    maxgaps | maxwidth | extend | before | after | containing |
    not_containing | contained_by | not_contained_by | within |
    not_within | overlapping | non_overlapping. ``n``/``n2`` carry
    the numeric arguments (minShouldMatch, maxGaps, maxWidth,
    positions, extend-before/after)."""

    kind: str
    children: tuple = ()
    term: str | None = None
    n: int = 0
    n2: int = 0


def leaf_terms(node: ISrc) -> tuple[str, ...]:
    if node.kind == "term":
        return (node.term,)
    out: list[str] = []
    for c in node.children:
        out.extend(leaf_terms(c))
    return tuple(dict.fromkeys(out))


# Max ordered/phrase/unordered variants one node may expand into.
# 64 covers hand-written or() nesting; a 128-term wildcard expansion
# under fn:ordered stays un-rewritten (Lucene callers pass
# rewrite=false to Intervals.or for exactly that case).
_PULL_UP_LIMIT = 64


def _alts(node: "ISrc") -> tuple:
    """A rewritten node's disjunctive alternatives (Lucene
    IntervalsSource.pullUpDisjunctions): an or() offers its children,
    anything else offers itself."""
    return node.children if node.kind == "or" else (node,)


def pull_up_disjunctions(node: "ISrc", limit: int = _PULL_UP_LIMIT) -> "ISrc":
    """Bottom-up disjunction pull-up (Lucene Intervals.java /
    Disjunctions.pullUp; OrderedIntervalsSource.build,
    BlockIntervalsSource.build, UnorderedIntervalsSource.build,
    ExtendedIntervalsSource / ContainedBy / Containing
    pullUpDisjunctions). Semantics-changing exactly where Lucene's is:
    an alternative suppressed by the or()'s minimal stream (because a
    shorter alternative is nested inside it) is evaluated in its own
    variant and can seed a block/ordered chain. Negative filters
    (not_*, non_overlapping), maxgaps/maxwidth, atleast, before/after
    and unordered_no_overlaps do NOT pull through — they filter the
    minimal stream, matching Lucene's singleton pullUpDisjunctions on
    those sources."""
    k = node.kind
    if k in ("term", "none") or not node.children:
        return node
    kids = tuple(pull_up_disjunctions(c, limit) for c in node.children)
    if k == "or":
        flat: list[ISrc] = []
        for c in kids:
            flat.extend(_alts(c))
        return flat[0] if len(flat) == 1 else ISrc("or", tuple(flat))
    if k in ("ordered", "phrase", "unordered"):
        per_child = [_alts(c) for c in kids]
        total = 1
        for a in per_child:
            total *= len(a)
            if total > limit:
                break
        if 1 < total <= limit:
            variants = tuple(ISrc(k, combo) for combo in product(*per_child))
            return ISrc("or", variants)
        return ISrc(k, kids)
    if k == "extend" and kids[0].kind == "or":
        return ISrc(
            "or",
            tuple(ISrc(k, (c,), n=node.n, n2=node.n2) for c in kids[0].children),
        )
    if k in ("contained_by", "within") and kids[0].kind == "or":
        # small-side pull-up (ContainedByIntervalsSource)
        return ISrc(
            "or",
            tuple(
                ISrc(k, (c, kids[1]), n=node.n, n2=node.n2)
                for c in kids[0].children
            ),
        )
    if k == "containing" and kids[0].kind == "or":
        # big-side pull-up (ContainingIntervalsSource)
        return ISrc(
            "or",
            tuple(
                ISrc(k, (c, kids[1]), n=node.n, n2=node.n2)
                for c in kids[0].children
            ),
        )
    return ISrc(k, kids, term=node.term, n=node.n, n2=node.n2)


def _minimalize(ivs):
    """Reduce to the minimal set: drop any interval that properly
    contains another; dedupe (start, end) keeping the smallest gaps."""
    if not ivs:
        return []
    best: dict[tuple[int, int], int] = {}
    for s, e, g in ivs:
        k = (s, e)
        if k not in best or g < best[k]:
            best[k] = g
    # one candidate per start: the shortest
    by_start: dict[int, tuple[int, int]] = {}
    for (s, e), g in sorted(best.items()):
        if s not in by_start:
            by_start[s] = (e, g)
    out = []
    min_e = None
    for s in sorted(by_start, reverse=True):
        e, g = by_start[s]
        if min_e is None or e < min_e:
            out.append((s, e, g))
            min_e = e
    out.reverse()
    return out


def _ordered(children):
    """Minimal intervals with one sub-interval per child, in order,
    non-overlapping (next.start > prev.end — OrderedIntervalsSource).
    Children are minimal ⇒ starts and ends strictly increase, so the
    first child interval starting past prev.end also ends earliest:
    greedy chaining from each first-child interval is exact."""
    if any(not c for c in children):
        return []
    out = []
    starts = [[iv[0] for iv in c] for c in children]
    for s0, e0, g0 in children[0]:
        s, e, g = s0, e0, g0
        ok = True
        for ci in range(1, len(children)):
            j = bisect_right(starts[ci], e)
            if j >= len(children[ci]):
                ok = False
                break
            ns, ne, ng = children[ci][j]
            g += ng + (ns - e - 1)
            e = ne
        if ok:
            out.append((s0, e, g))
    return _minimalize(out)


def _block(children):
    """Exact adjacency (next.start == prev.end + 1) — Lucene phrase/
    block semantics over arbitrary sub-sources."""
    if any(not c for c in children):
        return []
    start_map = [{iv[0]: (iv[1], iv[2]) for iv in c} for c in children]
    out = []
    for s0, e0, g0 in children[0]:
        s, e, g = s0, e0, g0
        ok = True
        for ci in range(1, len(children)):
            got = start_map[ci].get(e + 1)
            if got is None:
                ok = False
                break
            e, ng = got
            g += ng
        if ok:
            out.append((s0, e, g))
    return _minimalize(out)


def _unordered(children):
    """Minimal covering windows containing one interval from each
    child (overlap permitted — UnorderedIntervalsSource). K-way sweep:
    record the current window, advance the child holding the earliest
    start."""
    if any(not c for c in children):
        return []
    idx = [0] * len(children)
    out = []
    while True:
        cur = [children[i][idx[i]] for i in range(len(children))]
        lo = min(iv[0] for iv in cur)
        hi = max(iv[1] for iv in cur)
        covered = sum(iv[1] - iv[0] + 1 for iv in cur)
        inner = sum(iv[2] for iv in cur)
        out.append((lo, hi, max(0, (hi - lo + 1) - covered) + inner))
        ci = min(range(len(children)), key=lambda i: cur[i][0])
        idx[ci] += 1
        if idx[ci] >= len(children[ci]):
            break
    return _minimalize(out)


def _unordered_no_overlaps(a, b):
    out = []
    for sa, ea, ga in a:
        for sb, eb, gb in b:
            if ea < sb or eb < sa:  # disjoint
                lo, hi = min(sa, sb), max(ea, eb)
                covered = (ea - sa + 1) + (eb - sb + 1)
                out.append((lo, hi, (hi - lo + 1) - covered + ga + gb))
    return _minimalize(out)


def _contains_some(a_iv, b_list, b_starts):
    """a ⊇ some b? minimal b ⇒ the first b with start ≥ a.start has
    the smallest end among them."""
    s, e = a_iv[0], a_iv[1]
    j = bisect_left(b_starts, s)
    return j < len(b_list) and b_list[j][1] <= e


def _contained_by_some(a_iv, b_list, b_starts):
    """a ⊆ some b? minimal b ⇒ the last b with start ≤ a.start has
    the largest end among them."""
    s, e = a_iv[0], a_iv[1]
    j = bisect_right(b_starts, s) - 1
    return j >= 0 and b_list[j][1] >= e


def _overlaps_some(a_iv, b_list, b_starts):
    s, e = a_iv[0], a_iv[1]
    j = bisect_right(b_starts, e) - 1
    return j >= 0 and b_list[j][1] >= s


def _extend(ivs, before: int, after: int):
    return _minimalize([(max(0, s - before), e + after, g) for s, e, g in ivs])


def eval_tree(node: ISrc, pos_of) -> list[tuple[int, int, int]]:
    """Minimal intervals of ``node`` in one document. ``pos_of`` maps
    term → sorted position array (missing/empty = term absent)."""
    k = node.kind
    if k == "term":
        pos = pos_of.get(node.term)
        if pos is None:
            return []
        return [(int(p), int(p), 0) for p in pos]
    if k == "none":
        return []
    if k == "or":
        out = []
        for c in node.children:
            out.extend(eval_tree(c, pos_of))
        return _minimalize(out)
    if k in ("ordered", "unordered", "phrase", "unordered_no_overlaps", "atleast"):
        kids = [eval_tree(c, pos_of) for c in node.children]
        if k == "ordered":
            return _ordered(kids)
        if k == "phrase":
            return _block(kids)
        if k == "unordered":
            return _unordered(kids)
        if k == "unordered_no_overlaps":
            return _unordered_no_overlaps(kids[0], kids[1])
        # atleast(n): minimal windows covering intervals from ≥ n
        # distinct children = union of unordered() over the n-subsets
        # of children that matched (MinimumShouldMatchIntervalsSource)
        present = [c for c in kids if c]
        if len(present) < node.n or node.n <= 0:
            return []
        out = []
        for combo in combinations(present, node.n):
            out.extend(_unordered(list(combo)))
        return _minimalize(out)
    if k == "maxgaps":
        return [iv for iv in eval_tree(node.children[0], pos_of) if iv[2] <= node.n]
    if k == "maxwidth":
        return [
            iv for iv in eval_tree(node.children[0], pos_of) if iv[1] - iv[0] + 1 <= node.n
        ]
    if k == "extend":
        return _extend(eval_tree(node.children[0], pos_of), node.n, node.n2)
    # two-stream filters
    a = eval_tree(node.children[0], pos_of)
    if not a:
        return []
    b = eval_tree(node.children[1], pos_of)
    if k in ("within", "not_within"):
        b = _extend(b, node.n, node.n)
    if k == "before":
        if not b:
            return []
        max_bs = max(iv[0] for iv in b)
        return [iv for iv in a if iv[1] < max_bs]
    if k == "after":
        if not b:
            return []
        min_be = min(iv[1] for iv in b)
        return [iv for iv in a if iv[0] > min_be]
    b_starts = [iv[0] for iv in b]
    if k == "containing":
        return [iv for iv in a if b and _contains_some(iv, b, b_starts)]
    if k == "not_containing":
        return [iv for iv in a if not (b and _contains_some(iv, b, b_starts))]
    if k in ("contained_by", "within"):
        return [iv for iv in a if b and _contained_by_some(iv, b, b_starts)]
    if k in ("not_contained_by", "not_within"):
        return [iv for iv in a if not (b and _contained_by_some(iv, b, b_starts))]
    if k == "overlapping":
        return [iv for iv in a if b and _overlaps_some(iv, b, b_starts)]
    if k == "non_overlapping":
        return [iv for iv in a if not (b and _overlaps_some(iv, b, b_starts))]
    raise ValueError(f"unknown interval source kind {k!r}")


def doc_candidates(node: ISrc, docs_of) -> np.ndarray:
    """Conservative candidate doc set for per-doc evaluation —
    the tree's presence algebra over per-term posting doc arrays
    (``docs_of(term)`` → sorted np.int64 array). Supersets the true
    match set; the per-doc interval check decides membership."""
    k = node.kind
    if k == "term":
        return docs_of(node.term)
    if k == "none":
        return np.empty(0, np.int64)
    kids = node.children
    if k in _ALL_CHILDREN or k in _NEEDS_BOTH:
        out = doc_candidates(kids[0], docs_of)
        for c in kids[1:]:
            if out.size == 0:
                break
            out = np.intersect1d(out, doc_candidates(c, docs_of), assume_unique=True)
        return out
    if k in _MINUEND_ONLY or k in _PASS_THROUGH:
        return doc_candidates(kids[0], docs_of)
    if k == "or":
        arrs = [doc_candidates(c, docs_of) for c in kids]
        return np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
    if k == "atleast":
        arrs = [doc_candidates(c, docs_of) for c in kids]
        if not arrs or node.n <= 0:
            return np.empty(0, np.int64)
        allv = np.concatenate([np.unique(a) for a in arrs])
        vals, counts = np.unique(allv, return_counts=True)
        return vals[counts >= node.n]
    raise ValueError(f"unknown interval source kind {k!r}")

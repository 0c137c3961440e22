"""Fuzz/property tests for the query-string parser.

The reference's parser (zulia-query-parser ZuliaSyntaxParser.jj) is a
generated JavaCC grammar whose failure mode for malformed input is a
typed ParseException, never a crash. Mirror that contract here: for
ANY input string, ``parse_query`` either returns a ``Bool`` tree or
raises ``ParseError`` — no other exception type, no hang. Plus
grammar identities a user relies on (modifier/paren/default-op
equivalences). Pure-Python; no Spark session needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from zuliasearch_spark.search.parser import Bool, ParseError, parse_query

# characters weighted toward the grammar's specials so the fuzz
# actually reaches the interesting branches, not just bare terms
_ALPHABET = st.sampled_from(
    list("abcz019 \t()[]{}+-!|&^~*?:\"'/\\.,<>=#@%")
    + ["AND", "OR", "NOT", "TO", "fn", "zl", "ns", "tq", "geo"]
)
_QUERY = st.lists(_ALPHABET, min_size=0, max_size=24).map("".join)


@settings(max_examples=1500, deadline=None)
@given(_QUERY, st.sampled_from(["OR", "AND"]))
def test_parse_never_crashes(q, default_op):
    """Arbitrary input → a Bool tree or ParseError, nothing else."""
    try:
        root = parse_query(q, default_op=default_op)
    except ParseError:
        return
    assert isinstance(root, Bool)
    assert root.children


_TERM = st.text(alphabet="abcdxyz", min_size=1, max_size=6)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TERM, min_size=2, max_size=4))
def test_explicit_op_equals_default_op(terms):
    """`a AND b` under default OR ≡ `a b` under default AND (the
    reference parses both through the same conjunction path)."""
    explicit = parse_query(" AND ".join(terms), default_op="OR")
    implicit = parse_query(" ".join(terms), default_op="AND")
    assert [(occ, _shape(c)) for occ, c in explicit.children] == [
        (occ, _shape(c)) for occ, c in implicit.children
    ]


@settings(max_examples=300, deadline=None)
@given(_TERM, _TERM)
def test_not_minus_equivalence(a, b):
    """`a NOT b`, `a -b` and `a !b` produce the same occur pattern."""
    shapes = {
        tuple((occ, _shape(c)) for occ, c in parse_query(q).children)
        for q in (f"{a} NOT {b}", f"{a} -{b}", f"{a} !{b}")
    }
    assert len(shapes) == 1


@settings(max_examples=300, deadline=None)
@given(st.lists(_TERM, min_size=1, max_size=3))
def test_redundant_parens_are_transparent(terms):
    """Wrapping the whole query in (...) is semantically neutral: the
    parse differs only by a no-op wrapper group (mm=0, boost=1,
    occur SHOULD) — the same tree after normalizing such wrappers."""
    q = " ".join(terms)
    assert _shape(_normalize(parse_query(q))) == _shape(
        _normalize(parse_query(f"({q})"))
    )


def _normalize(node):
    """Collapse semantically-neutral single-SHOULD Bool wrappers."""
    while (
        isinstance(node, Bool)
        and len(node.children) == 1
        and node.children[0][0] == "SHOULD"
        and isinstance(node.children[0][1], Bool)
        and node.mm == 0
        and node.boost == 1.0
    ):
        node = node.children[0][1]
    if isinstance(node, Bool):
        return Bool(
            children=[(occ, _normalize(c)) for occ, c in node.children],
            mm=node.mm,
            boost=node.boost,
        )
    return node


def _shape(node):
    """Structural fingerprint ignoring object identity."""
    if isinstance(node, Bool):
        return (
            "bool",
            node.mm,
            tuple((occ, _shape(c)) for occ, c in node.children),
        )
    return tuple(
        (k, _shape_v(getattr(node, k)))
        for k in sorted(vars(node))
        if not k.startswith("_")
    )


def _shape_v(v):
    if isinstance(v, (list, tuple)):
        return tuple(_shape_v(x) for x in v)
    if isinstance(v, Bool) or hasattr(v, "__dict__"):
        return _shape(v)
    return v

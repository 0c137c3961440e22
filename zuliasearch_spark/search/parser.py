"""Query-string parser: the common subset of Zulia's query syntax.

Grammar source: ZuliaSyntaxParser.jj (tokens :138-215 — AND/OR/NOT,
+/-, parens, field:, ranges [a TO b] / {a TO b}, comparison ops,
boosts ^N, QUOTED phrases with ~slop, fuzzy term~N, wildcard *?,
regex /re/, group min-match (...)~N and Zulia's (...)@N), driven by
QueryParserTest.java as the behavioral spec. Occur assignment
follows Lucene's classic addClause rules: an explicit ``+`` makes a
clause required and ``-``/``NOT`` prohibited regardless of operators;
``a AND b`` promotes both sides to required; under a default-AND
operator an explicit OR demotes both sides to optional.

The parse result is a small AST (Bool / Leaf / Range nodes). Leaves
stay raw here; ``resolve_tree`` (below) analyzes text per field,
expands wildcards/fuzzies against the term dictionary, and produces
spec leaves the kernel evaluator (matcher.evaluate_tree) consumes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield

from zuliasearch_spark.search.query import PhraseSpec, TermSpec

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


# ---------------------------------------------------------------------------
# AST


@dataclass
class Leaf:
    text: str
    field: str | None = None
    boost: float = 1.0
    fuzzy: int | None = None  # term~N (None = not fuzzy; term~ → 2)
    phrase: bool = False  # "quoted"
    slop: int = 0
    regex: bool = False  # /regex/


@dataclass
class Range:
    field: str | None
    lo: str | None  # None = open
    hi: str | None
    incl_lo: bool = True
    incl_hi: bool = True
    boost: float = 1.0


@dataclass
class Bool:
    children: list[tuple[str, object]] = dfield(default_factory=list)  # (occur, node)
    mm: int = 0
    boost: float = 1.0


@dataclass
class Interval:
    """fn:ordered(...) / fn:unordered(...) with optional ~maxgaps
    (Function lexer state, ZuliaSyntaxParser.jj:193-215)."""

    words: tuple[str, ...]
    ordered: bool
    max_gaps: int = -1
    field: str | None = None
    boost: float = 1.0


@dataclass
class ExistsSpec:
    """field:* — FieldExistsQuery (ZuliaPureWildcardNodeProcessor
    .java:24-39): constant-score match of every doc with ≥1 indexed
    token in the field (backed by the norms rows)."""

    field: str
    required: bool = False
    group: int = 0
    subgroup: int = 0


class ParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<and>AND\b|&&)
    # |||field||| (list-length meta) must match before the OR token
    # eats its leading bars; |field| (char-length meta) lexes as a
    # plain term since '|' is a term character
  | (?P<metafield>\|\|\|[^\s|]+\|\|\|)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<quoted>"(?:[^"\\]|\\.)*")
  | (?P<regex>/(?:[^/\\]|\\.)+/)
  | (?P<rangein>\[)
  | (?P<rangeex>\{)
  | (?P<rbrack>\])
  | (?P<rbrace>\})
  | (?P<carat>\^)
  | (?P<tilde>~)
  | (?P<at>@)
  | (?P<cmp><=|>=|<|>|=)
  | (?P<colon>:)
    # terms: like the reference, '-'/'+' cannot START a term but may
    # appear inside one (_TERM_CHAR, ZuliaSyntaxParser.jj:146) — so
    # "2024-06-17" is one token while "-fly" is MINUS + term
  | (?P<term>(?:[^\s+\-!():^@<>=\[\]"{}~\\/]|\\.)(?:[^\s!():^@<>=\[\]"{}~\\/]|\\.)*)
  | (?P<plus>\+)
  | (?P<minus>-)
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str
    start: int = 0
    end: int = 0


def _lex(q: str) -> list[_Tok]:
    out: list[_Tok] = []
    i = 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if m is None:
            raise ParseError(f"cannot lex query at {q[i:]!r}")
        start, i = m.start(), m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(_Tok(kind, m.group(), start, i))
    return out


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


# ---------------------------------------------------------------------------
# parser


class _Parser:
    def __init__(self, q: str, default_op: str = "OR"):
        self.toks = _lex(q)
        self.i = 0
        self.q = q
        self.default_and = default_op.upper() == "AND"

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise ParseError(f"unexpected end of query: {self.q!r}")
        self.i += 1
        return t

    # Lucene QueryParserBase#addClause occur logic
    def _occur(self, mods: str | None, conj: str | None, clauses) -> str:
        if mods == "-":
            return MUST_NOT
        if conj == "AND" and clauses:
            prev_occur, prev_node = clauses[-1]
            if prev_occur != MUST_NOT:
                clauses[-1] = (MUST, prev_node)
        if self.default_and and conj == "OR" and clauses:
            prev_occur, prev_node = clauses[-1]
            if prev_occur != MUST_NOT:
                clauses[-1] = (SHOULD, prev_node)
        if mods == "+":
            return MUST
        if not self.default_and:
            return MUST if conj == "AND" else SHOULD
        return SHOULD if conj == "OR" else MUST

    def parse_group(self, stop_at_rparen: bool) -> Bool:
        node = Bool()
        conj: str | None = None
        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind == "rparen":
                if stop_at_rparen:
                    break
                raise ParseError("unbalanced ')'")
            if t.kind == "and":
                self.next()
                conj = "AND"
                continue
            if t.kind == "or":
                self.next()
                conj = "OR"
                continue
            mods = None
            if t.kind in ("plus", "minus", "not"):
                self.next()
                mods = "-" if t.kind in ("minus", "not") else "+"
                t = self.peek()
                if t is None:
                    raise ParseError("dangling modifier")
            child = self.parse_atom()
            occur = self._occur(mods, conj, node.children)
            node.children.append((occur, child))
            conj = None
        return node

    def parse_atom(self):
        t = self.next()
        fieldname = None
        if t.kind in ("term", "metafield"):
            nxt = self.peek()
            if t.text == "fn" and nxt is not None and nxt.kind == "colon":
                self.next()  # consume ':'
                return self._parse_interval_fn()
            if nxt is not None and nxt.kind in ("colon", "cmp"):
                fieldname = _unescape(t.text)
                op = self.next()
                if op.kind == "cmp":
                    val = self.next()
                    if val.kind not in ("term", "quoted"):
                        raise ParseError(f"expected value after {op.text}")
                    v = _unescape(val.text.strip('"'))
                    # field>=v etc. → half-open range
                    if op.text == "=":
                        rng = Range(fieldname, v, v, True, True)
                    elif op.text == ">":
                        rng = Range(fieldname, v, None, False, True)
                    elif op.text == ">=":
                        rng = Range(fieldname, v, None, True, True)
                    elif op.text == "<":
                        rng = Range(fieldname, None, v, True, False)
                    else:
                        rng = Range(fieldname, None, v, True, True)
                    return self._suffixes(rng)
                t = self.next()
        if t.kind == "lparen":
            grp = self.parse_group(stop_at_rparen=True)
            if self.peek() is None or self.next().kind != "rparen":
                raise ParseError("missing ')'")
            grp = self._suffixes(grp)
            if fieldname is not None:
                _push_field(grp, fieldname)
            return grp
        if t.kind in ("rangein", "rangeex"):
            return self._parse_range(fieldname, incl_lo=t.kind == "rangein")
        if t.kind == "quoted":
            words = _unescape(t.text[1:-1]).split()
            leaf = Leaf(" ".join(words), field=fieldname, phrase=True)
            return self._suffixes(leaf)
        if t.kind == "regex":
            leaf = Leaf(_unescape(t.text[1:-1]), field=fieldname, regex=True)
            return self._suffixes(leaf)
        if t.kind == "term":
            leaf = Leaf(_unescape(t.text), field=fieldname)
            return self._suffixes(leaf)
        raise ParseError(f"unexpected token {t.text!r}")

    def _parse_interval_fn(self):
        """Interval functions (Function lexer state,
        ZuliaSyntaxParser.jj:190-215). Flat-source slice of Lucene's
        19 functions:

        - ``fn:ordered`` / ``fn:unordered`` (+ ``~maxgaps`` suffix)
        - ``fn:phrase(a b c)`` = ordered with zero gaps (consecutive)
        - ``fn:or(a b c)`` = any source present (rewrites to a SHOULD
          group — interval-frequency scoring is simplified to the
          boolean OR, consistent with the constant-score intervals)
        - ``fn:before(a b)`` / ``fn:after(a b)`` = two-source order
          constraint (doc matches iff a occurs before/after some b)

        Nested interval sources (fn:within, fn:containing, …) are not
        supported — sources here are plain terms."""
        name = self.next()
        supported = ("ordered", "unordered", "phrase", "or", "before", "after")
        if name.kind != "term" or name.text not in supported:
            raise ParseError(f"unsupported interval function {name.text!r}")
        if self.next().kind != "lparen":
            raise ParseError(f"fn:{name.text} needs '(...)'")
        words: list[str] = []
        while True:
            t = self.next()
            if t.kind == "rparen":
                break
            if t.kind != "term":
                raise ParseError(f"bad token {t.text!r} in fn:{name.text}")
            w = _unescape(t.text).rstrip(",")
            if w:
                words.append(w)
        if not words:
            raise ParseError(f"fn:{name.text} needs at least one term")
        if name.text == "or":
            node = Bool([(SHOULD, Leaf(w)) for w in words], mm=1)
        elif name.text in ("before", "after"):
            if len(words) != 2:
                raise ParseError(f"fn:{name.text} needs exactly two terms")
            pair = tuple(words) if name.text == "before" else (words[1], words[0])
            node = Interval(pair, ordered=True)
        elif name.text == "phrase":
            node = Interval(tuple(words), ordered=True, max_gaps=0)
        else:
            node = Interval(tuple(words), ordered=name.text == "ordered")
        return self._suffixes(node)

    def _parse_range(self, fieldname, incl_lo: bool) -> Range:
        # range body is re-read from the RAW string (the reference
        # grammar switches to a Range lexer state where any non-space
        # run is one value — RANGE_GOOP, ZuliaSyntaxParser.jj:215);
        # this keeps timestamps like 2024-06-17T16:10:00 intact
        t = self.peek()
        if t is None:
            raise ParseError("unterminated range")
        body_start = t.start
        end_pos = None
        j = body_start
        while j < len(self.q):
            ch = self.q[j]
            if ch == "\\":
                j += 2
                continue
            if ch in "]}":
                end_pos = j
                break
            j += 1
        if end_pos is None:
            raise ParseError("unterminated range")
        vals = [v.strip('"') for v in self.q[body_start:end_pos].split()]
        # advance the token cursor past the range body + closer
        while self.i < len(self.toks) and self.toks[self.i].start <= end_pos:
            self.i += 1
        end_kind = "rbrack" if self.q[end_pos] == "]" else "rbrace"
        if len(vals) != 3 or vals[1].upper() != "TO":
            raise ParseError(f"bad range body {' '.join(vals)!r}")
        lo_v, hi_v = _unescape(vals[0]), _unescape(vals[2])
        rng = Range(
            fieldname,
            None if lo_v == "*" else lo_v,
            None if hi_v == "*" else hi_v,
            incl_lo,
            end_kind == "rbrack",
        )
        return self._suffixes(rng)

    def _suffixes(self, node):
        while True:
            t = self.peek()
            if t is None:
                return node
            if t.kind == "carat":
                self.next()
                num = self.next()
                try:
                    node.boost = float(num.text)
                except ValueError as e:
                    raise ParseError(f"bad boost {num.text!r}") from e
                continue
            if t.kind in ("tilde", "at"):
                # ~ after quoted = slop; after group = mm (also @N);
                # after bare term = fuzzy (default 2 edits)
                self.next()
                num = None
                nt = self.peek()
                if nt is not None and nt.kind == "term" and re.fullmatch(r"\d+(\.\d+)?", nt.text):
                    num = self.next().text
                if isinstance(node, Bool):
                    node.mm = int(float(num)) if num else 1
                elif isinstance(node, Interval):
                    # ~N after fn:ordered/unordered = max gaps
                    node.max_gaps = int(float(num)) if num else 0
                elif isinstance(node, Leaf) and node.phrase:
                    node.slop = int(float(num)) if num else 0
                elif isinstance(node, Leaf):
                    node.fuzzy = int(float(num)) if num else 2
                else:
                    raise ParseError("~ not applicable here")
                continue
            return node


def _push_field(node, fieldname: str) -> None:
    """field:(...) scopes every leaf in the group."""
    if isinstance(node, Bool):
        for _, child in node.children:
            _push_field(child, fieldname)
    elif isinstance(node, (Leaf, Range)):
        if node.field is None:
            node.field = fieldname


def parse_query(q: str, default_op: str = "OR") -> Bool:
    p = _Parser(q, default_op)
    root = p.parse_group(stop_at_rparen=False)
    if p.peek() is not None:
        raise ParseError(f"trailing input at {p.peek().text!r}")
    if not root.children:
        raise ParseError("empty query")
    return root


# ---------------------------------------------------------------------------
# resolution: raw AST → spec-leaf AST for the kernel evaluator


@dataclass
class RLeaf:
    """One token resolved to (possibly multi-field / multi-term)
    specs with the TermSpec group algebra: OR across subgroups
    (fields), conj/disj of analyzed terms within a subgroup by the
    default operator."""

    specs: tuple = ()
    conj: bool = False  # multi-term token combines with AND
    boost: float = 1.0


@dataclass
class RBool:
    children: tuple = ()  # (occur, node)
    mm: int = 0
    boost: float = 1.0


@dataclass
class RRange:
    """Doc-values range (field:[a TO b], IndexOrDocValuesQuery path,
    SetQueryHelper.java:45-106): evaluated against doc_map columns by
    a Catalyst-pushed predicate, not in the postings kernel. Only
    valid as a top-level conjunct (MUST / MUST_NOT)."""

    field: str
    lo: str | None
    hi: str | None
    incl_lo: bool
    incl_hi: bool


def _meta_field(name: str) -> str:
    """|field| → _zcl_field (char length), |||field||| → _zll_field
    (list length) — FieldTypeUtil.getCharLengthWrap/getListLengthWrap
    (FieldTypeUtil.java:108-115); the meta columns are written by
    IndexConfig.store_length_meta."""
    if name.startswith("|||") and name.endswith("|||") and len(name) > 6:
        return "_zll_" + name[3:-3]
    if name.startswith("|") and name.endswith("|") and len(name) > 2:
        return "_zcl_" + name[1:-1]
    return name


def resolve_tree(
    node,
    analyze,
    default_fields: tuple[str, ...],
    expand_wildcard,
    expand_fuzzy,
    default_op: str = "OR",
    expand_field=None,
):
    """Raw AST → resolved AST. ``expand_wildcard(field, regex)`` and
    ``expand_fuzzy(field, term, edits)`` enumerate the term
    dictionary (driver-side, pushdown-pruned scans). ``expand_field``
    resolves field-mapping aliases (IndexConfig.expand_field)."""
    if expand_field is None:
        expand_field = lambda f: (f,)  # noqa: E731

    def field_targets(scoped_field):
        names = (scoped_field,) if scoped_field else tuple(default_fields)
        return tuple(dict.fromkeys(f for n in names for f in expand_field(n)))

    conj = default_op.upper() == "AND"
    if isinstance(node, Bool):
        children = tuple(
            (
                occur,
                resolve_tree(
                    c, analyze, default_fields, expand_wildcard, expand_fuzzy,
                    default_op, expand_field,
                ),
            )
            for occur, c in node.children
        )
        return RBool(children, node.mm, node.boost)
    if isinstance(node, Range):
        if node.field is None:
            raise ParseError("range needs a field")
        return RRange(
            _meta_field(node.field), node.lo, node.hi, node.incl_lo, node.incl_hi
        )
    if isinstance(node, Interval):
        from zuliasearch_spark.search.query import IntervalSpec

        fields = field_targets(node.field)
        if not fields:
            raise ParseError("no default fields for interval function")
        ispecs = []
        for sub, f in enumerate(fields):
            terms = tuple(analyze(f, " ".join(node.words)))
            if terms:
                ispecs.append(
                    IntervalSpec(
                        f, terms, node.ordered, node.max_gaps,
                        required=True, group=0, subgroup=sub,
                    )
                )
        return RLeaf(tuple(ispecs), conj=False, boost=node.boost)
    assert isinstance(node, Leaf)
    fields = field_targets(node.field)
    if not fields:
        raise ParseError(f"no default fields for term {node.text!r}")
    specs = []
    if node.text == "*" and not node.phrase and not node.regex:
        # pure wildcard field:* → field exists
        for sub, f in enumerate(fields):
            specs.append(ExistsSpec(f, required=False, group=0, subgroup=sub))
        return RLeaf(tuple(specs), conj=False, boost=node.boost)
    for sub, f in enumerate(fields):
        if node.phrase:
            terms = tuple(analyze(f, node.text))
            if len(terms) == 1 and node.slop == 0:
                specs.append(TermSpec(f, terms[0], required=False, group=0, subgroup=sub))
            elif terms:
                specs.append(PhraseSpec(f, terms, node.slop, required=True, group=0, subgroup=sub))
        elif node.regex:
            for t in expand_wildcard(f, node.text):
                specs.append(TermSpec(f, t, required=False, group=0, subgroup=sub))
        elif node.fuzzy is not None:
            base = analyze(f, node.text)
            seed = base[0] if base else node.text.lower()
            for t in expand_fuzzy(f, seed, node.fuzzy):
                specs.append(TermSpec(f, t, required=False, group=0, subgroup=sub))
        elif "*" in node.text or "?" in node.text:
            # wild*card → anchored regex over the dictionary
            # (ZuliaSyntaxParser wildcard terms → TermInSet expansion)
            rx = "^" + re.escape(node.text).replace(r"\*", ".*").replace(r"\?", ".") + "$"
            for t in expand_wildcard(f, rx):
                specs.append(TermSpec(f, t, required=False, group=0, subgroup=sub))
        else:
            for t in analyze(f, node.text):
                specs.append(TermSpec(f, t, required=conj, group=0, subgroup=sub))
    # expansion sets (wildcard/fuzzy/regex) OR their terms even under
    # a default-AND operator: mark disjunction by conj=False
    is_expansion = node.regex or node.fuzzy is not None or "*" in node.text or "?" in node.text
    return RLeaf(tuple(specs), conj=conj and not is_expansion and not node.phrase, boost=node.boost)


def tree_stat_keys(node) -> set[tuple[str, str]]:
    """(field, term) pairs needing stats/postings, plus (field, None)
    for exists leaves (norms rows)."""
    out: set[tuple[str, str]] = set()
    if isinstance(node, RBool):
        for _, c in node.children:
            out |= tree_stat_keys(c)
    elif isinstance(node, RLeaf):
        from zuliasearch_spark.search.query import IntervalSpec

        for s in node.specs:
            if isinstance(s, (PhraseSpec, IntervalSpec)):
                out.update(s.stat_keys)
            elif isinstance(s, ExistsSpec):
                out.add((s.field, None))
            else:
                out.add((s.field, s.term))
    return out


def tree_ranges(node, top=True):
    """Collect RRange leaves; raise if any sits below the top level
    (the doc-values join can only apply conjunctively)."""
    out = []
    if isinstance(node, RBool):
        for occur, c in node.children:
            if isinstance(c, RRange):
                if not top:
                    raise ParseError("ranges are only supported as top-level conjuncts")
                if occur == SHOULD and len(node.children) > 1:
                    raise ParseError("ranges are only supported as top-level conjuncts (MUST/MUST_NOT)")
                out.append((occur, c))
            else:
                out.extend(tree_ranges(c, top=False))
    return out


def strip_ranges(node):
    """Copy of the tree without its top-level RRange children
    (they become a doc-values predicate); None if nothing remains."""
    if not isinstance(node, RBool):
        return node
    kept = tuple((o, c) for o, c in node.children if not isinstance(c, RRange))
    if not kept:
        return None
    return RBool(kept, node.mm, node.boost)


def tree_has_positive_leaf(node) -> bool:
    if isinstance(node, RBool):
        return any(
            occur != MUST_NOT and tree_has_positive_leaf(c) for occur, c in node.children
        )
    return isinstance(node, RLeaf)

"""Declarative YAML query-assertion harness (zulia-testing analogue).

Reference parity: the reference's ``zulia-testing`` module runs a YAML
file of named searches plus boolean assertion expressions over their
results (``ZuliaTestRunner.java``; schema POJOs ``config/*.java``;
sample ``zulia-testing/src/test/resources/sample_testing.yaml``).
Searches are built from ``SearchConfig`` (queries with
FILTER/FILTER_NOT/SCORE_MUST/SCORE_SHOULD types + qf + mm, amount,
documentFields, count facets, stat facets, numeric stats), executed,
and shaped into ``QueryResultObject``s (``js/dto/*.java``) that a
GraalJS context exposes to each test's ``expr``.

This re-expression keeps the YAML surface and the result-object shape
(`name.count`, ``name.doc[0]["field"]`` / ``name.doc[0].field``,
``name.facet["f"][0].label/.count``,
``name.statFacet["facet-numeric"][0].sum/.docCount/...``,
``name.numStat["f"].percentiles[i].value``) and swaps the transport:

- a *connection* resolves to a local engine registry instead of a
  gRPC work pool (``ZuliaWorkPool``) — the architecture-level N/A
  documented in SURVEY §0; connections are still parsed and an index
  naming an unknown connection still fails fast
  (``ZuliaTestRunner.buildConnectionSupplier``).
- test expressions are evaluated by a SAFE whitelist evaluator over
  the Python ``ast`` instead of an embedded JS engine. The JS-isms
  the reference's corpus uses are translated: ``&&``/``||``/``!`` and
  the sample file's single-``=`` comparisons (GraalJS treats
  ``a.label = "X"`` inside an expression as an assignment whose value
  is truthy — here ``=`` outside ``== != <= >=`` is read as the
  equality the test author meant). No calls, no attribute writes, no
  imports — an expression can only read the result objects.

Deterministic: results come straight from the engine's DataFrames;
facet/stat orderings are the executor's documented deterministic
orders.
"""

from __future__ import annotations

import ast
import logging
import operator
from dataclasses import dataclass, field
from typing import Any, Mapping

LOG = logging.getLogger(__name__)


# ---- config schema (config/*.java POJOs) --------------------------------


@dataclass(frozen=True)
class ConnectionConfig:
    """ConnectionConfig.java — parsed for validation; the transport is
    a local engine registry, so serverAddress/port are not dialed."""

    name: str
    serverAddress: str = "localhost"
    port: int = 32191


@dataclass(frozen=True)
class IndexConfig:
    name: str
    indexName: str
    connection: str | None = None


@dataclass(frozen=True)
class QueryConfig:
    """QueryConfig.java — queryType defaults to SCORE_MUST."""

    q: str
    qf: tuple[str, ...] = ()
    mm: int = 0
    queryType: str = "SCORE_MUST"


@dataclass(frozen=True)
class FacetConfig:
    field: str
    topN: int = 0  # 0 → server default (10), like CountFacet


@dataclass(frozen=True)
class StatFacetConfig:
    facetField: str
    numericField: str
    topN: int = 0


@dataclass(frozen=True)
class NumStatConfig:
    numericField: str
    percentiles: tuple[float, ...] = ()
    # QueryRequestValidator.java:57-59 defaults percentile precision
    percentilePrecision: float = 0.001


@dataclass(frozen=True)
class SearchConfig:
    name: str
    index: str
    queries: tuple[QueryConfig, ...] = ()
    amount: int = 0
    documentFields: tuple[str, ...] = ()
    facets: tuple[FacetConfig, ...] = ()
    statFacets: tuple[StatFacetConfig, ...] = ()
    numStats: tuple[NumStatConfig, ...] = ()


@dataclass(frozen=True)
class TestConfig:
    name: str
    expr: str


@dataclass
class ZuliaTestConfig:
    connections: tuple[ConnectionConfig, ...] = ()
    indexes: tuple[IndexConfig, ...] = ()
    searches: tuple[SearchConfig, ...] = ()
    tests: tuple[TestConfig, ...] = ()
    logSearches: bool = False
    logSearchResults: bool = False


@dataclass
class TestResult:
    """result/TestResult.java: id + pass flag + the originating config."""

    testId: str
    passed: bool
    testConfig: TestConfig


def load_config(source: str) -> ZuliaTestConfig:
    """Parse the YAML schema (a path or YAML text) into config
    dataclasses — unknown keys fail loudly, like Jackson's strict POJO
    binding the reference relies on."""
    import os

    import yaml

    if "\n" not in source and os.path.exists(source):
        with open(source) as f:
            raw = yaml.safe_load(f)
    else:
        raw = yaml.safe_load(source)
    if not isinstance(raw, dict):
        raise ValueError("zulia-testing YAML must be a mapping at top level")

    def build(cls, d: dict, lists: dict | None = None):
        lists = lists or {}
        known = {f.name for f in cls.__dataclass_fields__.values()} if hasattr(cls, "__dataclass_fields__") else set()
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown key(s) {sorted(unknown)} for {cls.__name__}")
        kw = {}
        for k, v in d.items():
            if k in lists:
                sub = lists[k]
                kw[k] = tuple(build(sub[0], x, sub[1] if len(sub) > 1 else None) for x in (v or []))
            elif isinstance(v, list):
                kw[k] = tuple(v)
            else:
                kw[k] = v
        return cls(**kw)

    top_lists = {
        "connections": (ConnectionConfig,),
        "indexes": (IndexConfig,),
        "searches": (SearchConfig, {
            "queries": (QueryConfig,),
            "facets": (FacetConfig,),
            "statFacets": (StatFacetConfig,),
            "numStats": (NumStatConfig,),
        }),
        "tests": (TestConfig,),
    }
    return build(ZuliaTestConfig, raw, top_lists)


# ---- result objects (js/dto/*.java) -------------------------------------


class Doc(dict):
    """DocumentProxyObject: a stored document readable BOTH ways —
    ``doc["field"]`` and ``doc.field`` — with nested documents/lists
    wrapped on access (nestedDocumentAccess in ZuliaTestRunnerTest)."""

    def __getitem__(self, key):
        return _wrap(super().__getitem__(key))

    def __getattr__(self, name):
        try:
            return _wrap(self[name])
        except KeyError as e:
            raise AttributeError(name) from e


def _wrap(v):
    if isinstance(v, Doc):
        return v
    if isinstance(v, dict):
        return Doc(v)
    if isinstance(v, (list, tuple)):
        return [_wrap(x) for x in v]
    return v


@dataclass
class FacetValue:
    """FacetValueObject.java"""

    label: str
    count: int


@dataclass
class PercentileValue:
    """PercentileValueObject.java"""

    point: float
    value: float


@dataclass
class StatFacetValue:
    """StatFacetValueObject.java — used for statFacet entries AND
    numStat values (the reference reuses the DTO for both)."""

    label: str | None = None
    docCount: int = 0
    allDocCount: int = 0
    valueCount: int = 0
    sum: float | int = 0
    min: float | int | None = None
    max: float | int | None = None
    percentiles: list[PercentileValue] = field(default_factory=list)


@dataclass
class QueryResultObject:
    """QueryResultObject.java: what a test expression sees per search."""

    count: int = 0
    doc: list[Doc] | None = None
    facet: dict[str, list[FacetValue]] | None = None
    statFacet: dict[str, list[StatFacetValue]] | None = None
    numStat: dict[str, StatFacetValue] | None = None


# ---- safe expression evaluation -----------------------------------------

_CMP = {
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
}
_BIN = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.Mod: operator.mod,
}


def _js_to_python(expr: str) -> str:
    """Translate the JS-expression subset to Python source: && → and,
    || → or, ! → not (except !=), lone = → == — all outside string
    literals."""
    out: list[str] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c in "'\"":
            j = i + 1
            while j < n and expr[j] != c:
                j += 2 if expr[j] == "\\" else 1
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        two = expr[i : i + 2]
        if two == "&&":
            out.append(" and ")
            i += 2
        elif two == "||":
            out.append(" or ")
            i += 2
        elif two in ("==", "!=", "<=", ">="):
            out.append(two)
            i += 2
        elif c == "!":
            out.append(" not ")
            i += 1
        elif c == "=":
            # single '=' — the sample corpus writes equality this way
            out.append("==")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _eval_node(node: ast.AST, names: Mapping[str, Any]):
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, names)
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        if node.id not in names:
            raise NameError(f"unknown search result {node.id!r} in test expression")
        return names[node.id]
    if isinstance(node, ast.Attribute):
        if node.attr.startswith("_"):
            raise ValueError(f"attribute {node.attr!r} not allowed")
        base = _eval_node(node.value, names)
        if isinstance(base, dict):
            return _wrap(base[node.attr])
        return getattr(base, node.attr)
    if isinstance(node, ast.Subscript):
        base = _eval_node(node.value, names)
        key = _eval_node(node.slice, names)
        if isinstance(key, float) and key.is_integer():
            key = int(key)
        return base[key]
    if isinstance(node, ast.Compare):
        left = _eval_node(node.left, names)
        for op, rhs in zip(node.ops, node.comparators):
            fn = _CMP.get(type(op))
            if fn is None:
                raise ValueError(f"comparison {type(op).__name__} not allowed")
            right = _eval_node(rhs, names)
            if not fn(left, right):
                return False
            left = right
        return True
    if isinstance(node, ast.BoolOp):
        if isinstance(node.op, ast.And):
            v = True
            for sub in node.values:
                v = _eval_node(sub, names)
                if not v:
                    return v
            return v
        v = False
        for sub in node.values:
            v = _eval_node(sub, names)
            if v:
                return v
        return v
    if isinstance(node, ast.BinOp):
        fn = _BIN.get(type(node.op))
        if fn is None:
            raise ValueError(f"operator {type(node.op).__name__} not allowed")
        return fn(_eval_node(node.left, names), _eval_node(node.right, names))
    if isinstance(node, ast.UnaryOp):
        v = _eval_node(node.operand, names)
        if isinstance(node.op, ast.Not):
            return not v
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return +v
        raise ValueError(f"unary {type(node.op).__name__} not allowed")
    raise ValueError(
        f"{type(node).__name__} not allowed in a test expression "
        "(reads of search results only — no calls, no assignments)"
    )


def evaluate_expr(expr: str, results: Mapping[str, Any]) -> bool:
    """Evaluate one test expression against the named search results;
    returns its truthiness (Value.asBoolean on the reference side)."""
    tree = ast.parse(_js_to_python(expr).strip(), mode="eval")
    return bool(_eval_node(tree, results))


# ---- the runner (ZuliaTestRunner.java) ----------------------------------


class ZuliaTestRunner:
    """Run a ``ZuliaTestConfig``: execute every named search against
    its engine, shape results into ``QueryResultObject``s, then
    evaluate each test expression.

    ``engines`` maps the YAML ``indexName`` to a built
    ``SearchEngine`` — the local analogue of resolving an index's
    connection to a ``ZuliaWorkPool``.
    """

    def __init__(self, config: ZuliaTestConfig, engines: Mapping[str, Any] | None = None):
        self.config = config
        self.engines = dict(engines or {})
        self._validate_connections()

    # -- wiring ----------------------------------------------------------

    def _validate_connections(self) -> None:
        """buildConnectionSupplier: every index must name a known
        connection (when connections are declared at all)."""
        known = {c.name for c in self.config.connections}
        for ix in self.config.indexes:
            if ix.connection is not None and known and ix.connection not in known:
                raise ValueError(
                    f"Failed to find connection config <{ix.connection}> "
                    f"for index config <{ix.name}>"
                )

    def _engine_for(self, search: SearchConfig):
        by_name = {ix.name: ix for ix in self.config.indexes}
        ix = by_name.get(search.index)
        index_name = ix.indexName if ix is not None else search.index
        eng = self.engines.get(index_name)
        if eng is None:
            raise ValueError(
                f"no engine registered for index {index_name!r} "
                f"(search {search.name!r}); pass engines={{indexName: SearchEngine}}"
            )
        return eng

    # -- search building (buildSearch) -----------------------------------

    @staticmethod
    def build_request(search: SearchConfig):
        """SearchConfig → SearchRequest through the FULL query-string
        grammar (each QueryConfig.q is a Zulia query string — the
        reference hands it to ZuliaFlexibleQueryParser via
        FilterQuery/ScoredQuery). A single query maps 1:1 (qs/qf/mm);
        multiple queries compose with occur prefixes the same way
        ZuliaIndex.getQuery ORs/ANDs typed clauses into one
        BooleanQuery: SCORE_MUST/FILTER → ``+(q)``, FILTER_NOT →
        ``-(q)``, SCORE_SHOULD → ``(q)``, per-query mm → ``(q)~mm``.
        FILTER's no-score-contribution distinction affects ranking
        only, never membership — counts/facets/stats are identical.
        Queries with DIFFERENT qf can't share one request's expansion
        fields; that (unused in the reference's corpus) raises."""
        from zuliasearch_spark.search.query import SearchRequest

        qfs = {tuple(q.qf) for q in search.queries if q.qf}
        if len(qfs) > 1:
            raise ValueError(
                "queries with differing qf in one search are not supported; "
                "scope fields inside the query string instead (field:(...))"
            )
        qf = next(iter(qfs)) if qfs else ()

        for q in search.queries:
            qt = (q.queryType or "SCORE_MUST").upper()
            if qt not in ("FILTER", "FILTER_NOT", "SCORE_MUST", "SCORE_SHOULD"):
                raise ValueError(f"Unsupported query type <{q.queryType}>")

        if len(search.queries) == 1:
            q = search.queries[0]
            qs = q.q
            if (q.queryType or "").upper() == "FILTER_NOT":
                qs = f"-({qs})"  # negative-only fix-up injects MatchAll
            return SearchRequest(
                qs=qs, qf=qf, mm=int(q.mm), amount=max(search.amount, 0)
            )

        parts = []
        for q in search.queries:
            qt = (q.queryType or "SCORE_MUST").upper()
            grp = f"({q.q})~{int(q.mm)}" if q.mm else f"({q.q})"
            if qt in ("SCORE_MUST", "FILTER"):
                parts.append(f"+{grp}")
            elif qt == "FILTER_NOT":
                parts.append(f"-{grp}")
            else:
                parts.append(grp)
        return SearchRequest(
            qs=" ".join(parts), qf=qf, amount=max(search.amount, 0)
        )

    # -- running (buildAndRunQueries) ------------------------------------

    def run_queries(self) -> dict[str, QueryResultObject]:
        out: dict[str, QueryResultObject] = {}
        for search in self.config.searches:
            eng = self._engine_for(search)
            req = self.build_request(search)
            if self.config.logSearches:
                LOG.info("Running search %s:\n%s", search.name, req)
            res = eng.search(req, fetch="ids" if search.amount > 0 else "none")
            qr = QueryResultObject(count=int(res["totalHits"]))

            if search.amount > 0:
                ids = [t["uniqueId"] for t in res["topk"]]
                rows = eng.fetch(
                    ids, "FULL", document_fields=tuple(search.documentFields)
                ).collect()
                by_id = {r["uniqueId"]: r.asDict(recursive=True) for r in rows}
                docs = []
                for uid in ids:  # preserve rank order (CompleteResults)
                    d = by_id.get(uid, {})
                    d = {k: v for k, v in d.items() if k not in ("shard", "doc_id")}
                    docs.append(Doc(d))
                qr.doc = docs

            if search.facets:
                qr.facet = {}
                for fc in search.facets:
                    rows = eng.facet_counts(req, fc.field, top_n=fc.topN).collect()
                    qr.facet[fc.field] = [
                        FacetValue(label=str(r["value"]), count=int(r["cnt"]))
                        for r in rows
                    ]

            if search.statFacets:
                qr.statFacet = {}
                for sf in search.statFacets:
                    rows = eng.stat_facets(
                        req, sf.facetField, sf.numericField, top_n=sf.topN or 10
                    ).collect()
                    qr.statFacet[f"{sf.facetField}-{sf.numericField}"] = [
                        self._stat_value(r.asDict(), label=str(r["value"])) for r in rows
                    ]

            if search.numStats:
                qr.numStat = {}
                for ns in search.numStats:
                    row = eng.numeric_stats(req, ns.numericField).collect()[0].asDict()
                    sv = self._stat_value(row)
                    if ns.percentiles:
                        prow = (
                            eng.percentile_sketch_stats(
                                req,
                                ns.numericField,
                                percentiles=tuple(ns.percentiles),
                                precision=ns.percentilePrecision or 0.001,
                            )
                            .collect()[0]
                            .asDict()
                        )
                        sv.percentiles = [
                            PercentileValue(point=float(p), value=prow[f"p{int(p * 100)}"])
                            for p in ns.percentiles
                        ]
                    qr.numStat[ns.numericField] = sv

            if self.config.logSearchResults:
                LOG.info("Search result %s:\n%s", search.name, qr)
            out[search.name] = qr
        return out

    @staticmethod
    def _stat_value(row: dict, label: str | None = None) -> StatFacetValue:
        """Map the executor's stat columns to the DTO. Numeric types
        pass through as collected — integral Spark columns arrive as
        Python ints, doubles as floats, which IS the reference's
        long-vs-double SortValue coercion (getStatFacetValueObject)."""
        return StatFacetValue(
            label=label,
            docCount=int(row.get("doc_count") or 0),
            allDocCount=int(row.get("all_doc_count") or 0),
            valueCount=int(row.get("count_v") or 0),
            sum=row.get("sum_v") if row.get("sum_v") is not None else 0,
            min=row.get("min_v"),
            max=row.get("max_v"),
        )

    # -- evaluation (evaluateTestsWithQueryResults) ----------------------

    def evaluate_tests(self, results: Mapping[str, Any]) -> list[TestResult]:
        out = []
        for tc in self.config.tests:
            LOG.info("Running Test %s", tc.name)
            passed = evaluate_expr(tc.expr, results)
            LOG.info("Test %s %s", tc.name, "Passed" if passed else "Failed")
            out.append(TestResult(testId=tc.name, passed=passed, testConfig=tc))
        return out

    def run_tests(self) -> list[TestResult]:
        return self.evaluate_tests(self.run_queries())


def run_yaml_tests(source: str, engines: Mapping[str, Any]) -> list[TestResult]:
    """One-call convenience: YAML (path or text) + engine registry →
    test results."""
    return ZuliaTestRunner(load_config(source), engines).run_tests()

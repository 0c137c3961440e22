"""zulia-testing analogue: YAML query-assertion harness.

Unit tier mirrors ZuliaTestRunnerTest.java (expression evaluation over
hand-built QueryResultObjects); the end-to-end tier runs a YAML config
shaped like sample_testing.yaml against the gate documents engine at
sf0.001 and asserts the declared tests pass/fail as designed.
"""

from __future__ import annotations

import pytest

from zuliasearch_spark.testing import (
    Doc,
    FacetValue,
    PercentileValue,
    QueryResultObject,
    StatFacetValue,
    TestConfig,
    ZuliaTestConfig,
    ZuliaTestRunner,
    evaluate_expr,
    load_config,
)


def runner_for(tests):
    cfg = ZuliaTestConfig(tests=tuple(TestConfig(n, e) for n, e in tests))
    return ZuliaTestRunner(cfg)


# ---- ZuliaTestRunnerTest parity -----------------------------------------


def test_count_expression():
    r = runner_for([("highCount", "search1.count > 1000"), ("lowCount", "search1.count < 100")])
    qr = QueryResultObject(count=5000)
    res = r.evaluate_tests({"search1": qr})
    assert [t.passed for t in res] == [True, False]
    assert res[0].testId == "highCount"


def test_multiple_search_result_comparison():
    r = runner_for([("mostHaveTitle", "withoutTitle.count < allDocs.count * 0.01")])
    res = r.evaluate_tests(
        {
            "allDocs": QueryResultObject(count=100000),
            "withoutTitle": QueryResultObject(count=500),
        }
    )
    assert res[0].passed


def test_document_field_access():
    r = runner_for(
        [
            ("exactMatch", "search1.count == 1"),
            ("checkAuthor", 'search1.doc[0]["authors"][0]["lastName"] == "Smith"'),
            ("checkTitle", 'search1.doc[0].title == "Test Article"'),
        ]
    )
    doc = Doc(
        {"title": "Test Article", "authors": [{"lastName": "Smith", "firstName": "John"}]}
    )
    qr = QueryResultObject(count=1, doc=[doc])
    assert all(t.passed for t in r.evaluate_tests({"search1": qr}))


def test_nested_document_access():
    r = runner_for([("nestedField", 'search1.doc[0].address.city == "Boston"')])
    doc = Doc({"name": "Test", "address": {"city": "Boston", "state": "MA"}})
    qr = QueryResultObject(count=1, doc=[doc])
    assert r.evaluate_tests({"search1": qr})[0].passed


def test_facet_access():
    r = runner_for(
        [
            (
                "topYear",
                'search1.facet["pubYear"][0].label == "2022" && search1.facet["pubYear"][0].count > 1000',
            ),
            ("secondYear", 'search1.facet["pubYear"][1].label == "2021"'),
        ]
    )
    qr = QueryResultObject(
        count=9000,
        facet={"pubYear": [FacetValue("2022", 5000), FacetValue("2021", 4000)]},
    )
    assert all(t.passed for t in r.evaluate_tests({"search1": qr}))


def test_stat_facet_access():
    r = runner_for(
        [
            ("statLabel", 'search1.statFacet["pubYear-authorCount"][0].label == "2022"'),
            ("statDocCount", 'search1.statFacet["pubYear-authorCount"][0].docCount > 100'),
            ("statSum", 'search1.statFacet["pubYear-authorCount"][0].sum > 5000'),
        ]
    )
    sfv = StatFacetValue(
        label="2022", docCount=2000, allDocCount=2000, valueCount=2000, sum=10000, max=50, min=1
    )
    qr = QueryResultObject(count=2000, statFacet={"pubYear-authorCount": [sfv]})
    assert all(t.passed for t in r.evaluate_tests({"search1": qr}))


def test_num_stat_with_percentiles():
    r = runner_for(
        [
            ("avgCheck", '(search1.numStat["pubYear"].sum / search1.numStat["pubYear"].docCount) > 2008'),
            ("p10", 'search1.numStat["pubYear"].percentiles[0].value < 1996'),
            ("p90", 'search1.numStat["pubYear"].percentiles[2].value > 2021'),
        ]
    )
    stat = StatFacetValue(
        docCount=1000,
        sum=2015000,
        min=1950,
        max=2024,
        percentiles=[
            PercentileValue(0.1, 1990),
            PercentileValue(0.5, 2015),
            PercentileValue(0.9, 2023),
        ],
    )
    qr = QueryResultObject(count=1000, numStat={"pubYear": stat})
    assert all(t.passed for t in r.evaluate_tests({"search1": qr}))


def test_failing_test_reports_failure():
    r = runner_for([("shouldFail", "search1.count > 999")])
    res = r.evaluate_tests({"search1": QueryResultObject(count=10)})
    assert not res[0].passed
    assert res[0].testId == "shouldFail"


def test_result_preserves_config():
    tc = TestConfig("myTest", "s.count == 42")
    r = ZuliaTestRunner(ZuliaTestConfig(tests=(tc,)))
    res = r.evaluate_tests({"s": QueryResultObject(count=42)})
    assert res[0].passed and res[0].testConfig is tc


# ---- JS-expression translation + safety ---------------------------------


def test_js_operators_and_single_equals():
    # the sample corpus's `label = "X" && cond` shape reads as equality
    qr = QueryResultObject(count=5, facet={"f": [FacetValue("a", 7)]})
    assert evaluate_expr('q.facet["f"][0].label = "a" && q.count > 1', {"q": qr})
    assert evaluate_expr("!(q.count > 10) || q.count == 5", {"q": qr})
    assert not evaluate_expr('q.facet["f"][0].label != "a"', {"q": qr})


def test_string_literals_protected_from_translation():
    qr = QueryResultObject(count=1, doc=[Doc({"t": "a && b = c"})])
    assert evaluate_expr('q.doc[0].t == "a && b = c"', {"q": qr})


def test_unknown_search_name_errors():
    with pytest.raises(NameError):
        evaluate_expr("nosuch.count > 0", {})


def test_calls_and_assignments_rejected():
    with pytest.raises(ValueError):
        evaluate_expr("__import__('os').system('true')", {"q": QueryResultObject()})
    with pytest.raises((ValueError, SyntaxError)):
        evaluate_expr("q.count.__class__", {"q": QueryResultObject()})


def test_calls_rejected_even_on_results():
    with pytest.raises(ValueError):
        evaluate_expr("q.doc.pop()", {"q": QueryResultObject(doc=[])})


# ---- config loading ------------------------------------------------------

SAMPLE_YAML = """
logSearches: true
connections:
  - name: testConnection
    serverAddress: localhost
indexes:
  - name: docs
    indexName: documents
    connection: testConnection
searches:
  - name: allDocs
    index: docs
    queries:
      - q: "*:*"
        queryType: "FILTER"
  - name: enDocs
    index: docs
    queries:
      - q: "lang:en"
    facets:
      - field: lang
        topN: 5
    statFacets:
      - facetField: lang
        numericField: n_chars
        topN: 5
    numStats:
      - numericField: n_chars
        percentiles: [ 0.1, 0.5, 0.9 ]
  - name: oneDoc
    index: docs
    queries:
      - q: "*:*"
        queryType: "FILTER"
    amount: 1
    documentFields: [ "lang", "source" ]
tests:
  - name: someDocs
    expr: allDocs.count > 100
  - name: enSubset
    expr: enDocs.count < allDocs.count && enDocs.count > 0
  - name: topLangIsEn
    expr: enDocs.facet["lang"][0].label = "en" && enDocs.facet["lang"][0].count == enDocs.count
  - name: statFacetAgrees
    expr: enDocs.statFacet["lang-n_chars"][0].docCount == enDocs.count
  - name: medianInRange
    expr: enDocs.numStat["n_chars"].percentiles[1].value > enDocs.numStat["n_chars"].min && enDocs.numStat["n_chars"].percentiles[1].value < enDocs.numStat["n_chars"].max
  - name: docHasLang
    expr: oneDoc.doc[0]["lang"] != "" && oneDoc.count > 100
  - name: deliberateFail
    expr: allDocs.count < 0
"""


def test_load_config_sample():
    cfg = load_config(SAMPLE_YAML)
    assert cfg.logSearches and not cfg.logSearchResults
    assert cfg.indexes[0].indexName == "documents"
    assert cfg.searches[1].facets[0].topN == 5
    assert cfg.searches[1].numStats[0].percentiles == (0.1, 0.5, 0.9)
    assert cfg.searches[2].documentFields == ("lang", "source")
    assert len(cfg.tests) == 7
    # default queryType is SCORE_MUST (QueryConfig.java)
    assert cfg.searches[1].queries[0].queryType == "SCORE_MUST"


def test_unknown_yaml_key_fails():
    with pytest.raises(ValueError, match="unknown key"):
        load_config("searches:\n  - name: x\n    index: y\n    bogus: 1\n")


def test_unknown_connection_fails():
    cfg = load_config(
        "connections:\n  - name: a\nindexes:\n  - name: i\n    indexName: x\n    connection: nope\n"
    )
    with pytest.raises(ValueError, match="Failed to find connection"):
        ZuliaTestRunner(cfg)


# ---- end-to-end against the documents engine ----------------------------


@pytest.mark.slow
def test_yaml_end_to_end(spark):
    from zuliasearch_spark import gate

    sf = "/root/testdata/sf0.001"
    eng = gate.documents_engine(spark, sf)
    runner = ZuliaTestRunner(load_config(SAMPLE_YAML), engines={"documents": eng})
    results = runner.run_tests()
    by_name = {t.testId: t.passed for t in results}
    assert by_name == {
        "someDocs": True,
        "enSubset": True,
        "topLangIsEn": True,
        "statFacetAgrees": True,
        "medianInRange": True,
        "docHasLang": True,
        "deliberateFail": False,
    }


@pytest.mark.slow
def test_yaml_multi_query_composition(spark):
    """Two typed queries in one search compose like ZuliaIndex.getQuery:
    FILTER(lang:en) + FILTER_NOT(source:src0) == en docs outside src0."""
    from zuliasearch_spark import gate

    sf = "/root/testdata/sf0.001"
    eng = gate.documents_engine(spark, sf)
    yaml_text = """
indexes:
  - name: docs
    indexName: documents
searches:
  - name: en
    index: docs
    queries:
      - q: "lang:en"
        queryType: "FILTER"
  - name: enNotSrc0
    index: docs
    queries:
      - q: "lang:en"
        queryType: "FILTER"
      - q: "source:src0"
        queryType: "FILTER_NOT"
  - name: enSrc0
    index: docs
    queries:
      - q: "lang:en AND source:src0"
        queryType: "FILTER"
tests:
  - name: partition
    expr: enNotSrc0.count + enSrc0.count == en.count
  - name: strictSubset
    expr: enNotSrc0.count < en.count && enNotSrc0.count > 0
"""
    from zuliasearch_spark.testing import run_yaml_tests

    results = run_yaml_tests(yaml_text, {"documents": eng})
    assert all(t.passed for t in results), [(t.testId, t.passed) for t in results]

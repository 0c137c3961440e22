"""Parser edge cases mirrored from QueryParserEdgeCaseTest.java:
invalid/valid query-field boosts, fractional mm/slop rejection,
typed zl:ns value validation per numeric field type, exclusive
ranges at int/long extremes matching nothing (no overflow), and the
missing-default-fields error."""

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.parser import ParseError, parse_query
from zuliasearch_spark.search.query import parse_field_boost

INT_MAX, INT_MIN = 2**31 - 1, -(2**31)
LONG_MAX, LONG_MIN = 2**63 - 1, -(2**63)


@pytest.fixture(scope="module")
def engine(spark):
    rows = [
        ("1", "cancer research", "lung cancer studies", 1, 10, 1.5),
        ("2", "lung surgery", "cancer treatment", 2, LONG_MAX, 2.5),
        ("3", "heart disease", "cardiology report", INT_MAX, 30, 3.5),
    ]
    pdf = pd.DataFrame(
        rows, columns=["id", "title", "abstract", "count", "longField", "floatField"]
    )
    cfg = IndexConfig(
        index_name="edgecases",
        unique_id_col="id",
        number_of_shards=1,
        default_search_fields=("abstract", "title^2"),
        field_configs=(
            FieldConfig("title", index_as=(IndexAs("title", "whitespace_lc"),)),
            FieldConfig("abstract", index_as=(IndexAs("abstract", "whitespace_lc"),)),
        ),
    )
    sdf = spark.createDataFrame(
        pdf,
        schema="id string, title string, abstract string, "
        "count int, longField bigint, floatField float",
    )
    tables = build_index(
        sdf, cfg, stored_cols=("count", "longField", "floatField")
    ).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def test_invalid_field_boost_message():
    with pytest.raises(ValueError) as e:
        parse_field_boost("title^abc")
    assert str(e.value) == (
        "Invalid boost <abc> for query field <title^abc>. "
        "Boost must be a number, for example title^2"
    )
    with pytest.raises(ValueError) as e:
        parse_field_boost("title^")
    assert str(e.value) == (
        "Invalid boost <> for query field <title^>. "
        "Boost must be a number, for example title^2"
    )


def test_invalid_boost_surfaces_through_search(engine):
    with pytest.raises(ValueError, match="Invalid boost <abc>"):
        engine.search_string("cancer", qf=("title^abc",))


def test_valid_field_boost_doubles_title_weight(engine):
    # default fields are (abstract, title^2): doc 1 matches "cancer"
    # in BOTH fields; its title contribution must be exactly 2x the
    # unboosted title score. Compare against explicit single-field
    # searches.
    both = engine.search_string("cancer", qf=("abstract", "title^2"))
    abstract_only = engine.search_string("cancer", qf=("abstract",))
    title_only = engine.search_string("cancer", qf=("title",))
    s = {r["uniqueId"]: r["score"] for r in both["topk"]}
    sa = {r["uniqueId"]: r["score"] for r in abstract_only["topk"]}
    st = {r["uniqueId"]: r["score"] for r in title_only["topk"]}
    assert s["1"] == pytest.approx(sa["1"] + 2.0 * st["1"], rel=1e-5)
    # doc 2 matches "cancer" only in abstract: boost must not leak
    assert s["2"] == pytest.approx(sa["2"], rel=1e-6)


def test_field_boost_in_default_search_fields(engine):
    # the IndexConfig's own default fields carry the boost too
    via_defaults = engine.search_string("cancer")
    via_qf = engine.search_string("cancer", qf=("abstract", "title^2"))
    sd = {r["uniqueId"]: r["score"] for r in via_defaults["topk"]}
    sq = {r["uniqueId"]: r["score"] for r in via_qf["topk"]}
    assert sd == sq


def test_fractional_mm_raises():
    with pytest.raises(ParseError, match="whole number"):
        parse_query("title:(cancer lung)@2.5")
    with pytest.raises(ParseError, match="whole number"):
        parse_query("title:(cancer lung)~2.5")


def test_fractional_slop_raises():
    with pytest.raises(ParseError, match="whole number"):
        parse_query('title:"cancer lung"~1.5')


def test_whole_mm_and_slop_still_parse(engine):
    assert engine.search_string("title:(cancer lung)~1", amount=5)["totalHits"] == 2
    assert engine.search_string('abstract:"lung cancer"~0', amount=5)["totalHits"] == 1


def test_numeric_set_invalid_values(engine):
    with pytest.raises(ValueError) as e:
        engine.search_string("count:zl:ns(1 abc 3)", amount=1)
    assert str(e.value) == (
        "Invalid value <abc> for numeric set query on int field <count>. "
        "Every value must be a valid int"
    )
    # a valid number that is not a whole number still fails for int
    with pytest.raises(ValueError, match="Invalid value <2.5>.*valid int"):
        engine.search_string("count:zl:ns(1 2.5 3)", amount=1)
    # one past Long.MAX_VALUE overflows the long parse
    with pytest.raises(ValueError, match="Invalid value <9223372036854775808>.*valid long"):
        engine.search_string("longField:zl:ns(9223372036854775808)", amount=1)
    with pytest.raises(ValueError, match="Invalid value <notafloat>.*valid float"):
        engine.search_string("floatField:zl:ns(notafloat)", amount=1)


def test_numeric_set_valid(engine):
    assert engine.search_string("count:zl:ns(1 2 3)", amount=5)["totalHits"] == 2
    assert engine.search_string(f"longField:zl:ns({LONG_MAX})", amount=5)["totalHits"] == 1


def test_exclusive_range_at_int_extremes(engine):
    # {INT_MAX TO INT_MAX] must match nothing (the reference builds
    # MatchNoDocsQuery; a naive lower+1 overflow would match all)
    assert (
        engine.search_string(f"count:{{{INT_MAX} TO {INT_MAX}]", amount=5)["totalHits"]
        == 0
    )
    assert (
        engine.search_string(f"count:[{INT_MIN} TO {INT_MIN}}}", amount=5)["totalHits"]
        == 0
    )
    # one step inside the extreme still matches doc 3 (count=INT_MAX)
    assert (
        engine.search_string(f"count:{{{INT_MAX - 1} TO {INT_MAX}]", amount=5)["totalHits"]
        == 1
    )


def test_exclusive_range_at_long_extremes(engine):
    assert (
        engine.search_string(f"longField:{{{LONG_MAX} TO {LONG_MAX}]", amount=5)["totalHits"]
        == 0
    )
    assert (
        engine.search_string(f"longField:[{LONG_MIN} TO {LONG_MIN}}}", amount=5)["totalHits"]
        == 0
    )
    assert (
        engine.search_string(f"longField:{{{LONG_MAX - 1} TO {LONG_MAX}]", amount=5)["totalHits"]
        == 1
    )


def test_fieldless_term_without_defaults():
    from zuliasearch_spark.search.parser import resolve_tree

    root = parse_query("cancer")
    with pytest.raises(ParseError, match="no default fields"):
        resolve_tree(root, lambda f, t: [t], (), lambda f, rx: (), lambda f, t, e: ())

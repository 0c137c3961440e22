"""Field mappings: query-side alias → concrete indexed fields with
'*' patterns + includeSelf (zulia_index.proto:273-277 FieldMapping;
expansion FieldTypeUtil.expandFields:117-120; FieldWildcardTest,
FieldMappingTest semantics).

Oracle here is the ENGINE ITSELF on the explicitly-expanded query —
an alias query must be result-identical to the same query written
with the concrete field list — so the check is independent of
resolve_clause's internal expansion."""

import pytest

from tests.conftest import code_config
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest


@pytest.fixture(scope="module")
def engine(spark, corpus_t1):
    import dataclasses

    cfg = code_config(num_shards=2, quantize_norms=False)
    cfg = dataclasses.replace(
        cfg,
        field_mappings=(
            ("everything", ("content", "path"), False),
            ("texty", ("cont*",), False),
            ("pathplus", ("cont*",), True),  # includeSelf; 'pathplus' not indexed
        ),
    )
    tables = build_index(spark.createDataFrame(corpus_t1), cfg).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def _topk(res):
    return [(t["shard"], t["doc_id"], round(t["score"], 6)) for t in res["topk"]]


def test_alias_equals_explicit_field_list(engine):
    via_alias = engine.search(
        SearchRequest((C("SCORE_SHOULD", q="merge", qf=("everything",)),), amount=15),
        fetch="none",
    )
    explicit = engine.search(
        SearchRequest((C("SCORE_SHOULD", q="merge", qf=("content", "path")),), amount=15),
        fetch="none",
    )
    assert _topk(via_alias) == _topk(explicit)
    assert via_alias["totalHits"] == explicit["totalHits"]


def test_wildcard_pattern_expansion(engine):
    assert engine.config.expand_field("texty") == ("content",)
    via_alias = engine.search(
        SearchRequest((C("SCORE_MUST", q="texty:varint"),), amount=10), fetch="none"
    )
    explicit = engine.search(
        SearchRequest((C("SCORE_MUST", q="content:varint"),), amount=10), fetch="none"
    )
    assert _topk(via_alias) == _topk(explicit)


def test_include_self_appends_alias(engine):
    assert engine.config.expand_field("pathplus") == ("content", "pathplus")


def test_non_alias_passthrough(engine):
    assert engine.config.expand_field("lang") == ("lang",)


def test_alias_in_query_string(engine):
    via_alias = engine.search(
        SearchRequest(qs="everything:merge", amount=15), fetch="none"
    )
    explicit = engine.search(
        SearchRequest(qs="content:merge OR path:merge", amount=15), fetch="none"
    )
    assert _topk(via_alias) == _topk(explicit)


def test_empty_expansion_raises():
    import dataclasses

    cfg = dataclasses.replace(
        code_config(), field_mappings=(("ghost", ("nope*",), False),)
    )
    with pytest.raises(ValueError, match="matched no fields"):
        cfg.expand_field("ghost")


def test_range_on_alias_expands(spark):
    """A range on a field-mapping alias targets the expanded fields
    (OR of per-field ranges), like FieldTypeUtil.expandFields applies
    to all query-side fields — previously it hit the literal alias
    column and errored."""
    import dataclasses

    import pandas as pd

    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig

    cfg = IndexConfig(
        index_name="rng",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
        field_mappings=(("nums", ("n1", "n2"), False),),
    )
    pdf = pd.DataFrame(
        [
            ("r0", "x", 1, 100),
            ("r1", "x", 7, 100),
            ("r2", "x", 100, 8),
            ("r3", "x", 100, None),
        ],
        columns=["uniqueId", "content", "n1", "n2"],
    )
    pdf["n2"] = pdf["n2"].astype("Int64")
    tables = build_index(
        spark.createDataFrame(pdf), cfg, stored_cols=("n1", "n2")
    ).persist()
    try:
        eng = SearchEngine(tables)
        res = eng.search_string("content:x AND nums:[5 TO 10]", amount=10)
        assert sorted(t["uniqueId"] for t in res["topk"]) == ["r1", "r2"]
        # MUST_NOT keeps docs where neither expanded field is in range,
        # including the NULL-n2 doc (Lucene MUST_NOT semantics)
        res2 = eng.search_string("content:x AND NOT nums:[5 TO 10]", amount=10)
        assert sorted(t["uniqueId"] for t in res2["topk"]) == ["r0", "r3"]
    finally:
        tables.unpersist()


def test_doc_value_skip_index_policy():
    """DocValueSkipIndexPolicyTest: unset defaults on; explicit
    opt-out preserved; existing fields frozen to the persisted value;
    fields newly added to an existing index default on."""
    import dataclasses

    from zuliasearch_spark.config import (
        FieldConfig,
        IndexConfig,
        apply_doc_value_skip_index_policy,
    )

    def cfg(*fcs):
        return IndexConfig(index_name="dv", unique_id_col="id", field_configs=tuple(fcs))

    def skip_of(c, name):
        return {f.stored_field_name: f.doc_value_skip_index for f in c.field_configs}[name]

    # new index: unset -> on, explicit opt-out preserved
    resolved = apply_doc_value_skip_index_policy(
        cfg(FieldConfig("a"), FieldConfig("b", doc_value_skip_index=False))
    )
    assert skip_of(resolved, "a") is True
    assert skip_of(resolved, "b") is False

    # existing index: persisted value frozen against the request;
    # newly added field defaults on
    existing = apply_doc_value_skip_index_policy(
        cfg(FieldConfig("a", doc_value_skip_index=False))
    )
    resolved = apply_doc_value_skip_index_policy(
        cfg(FieldConfig("a", doc_value_skip_index=True), FieldConfig("b")), existing
    )
    assert skip_of(resolved, "a") is False, "persisted schema wins over the request"
    assert skip_of(resolved, "b") is True

    # round-trips through JSON settings
    back = IndexConfig.from_json(resolved.to_json())
    assert skip_of(back, "a") is False and skip_of(back, "b") is True

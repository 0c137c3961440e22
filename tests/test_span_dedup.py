"""C4-style duplicated-span removal (SURVEY §2.15).

No reference analogue — this is the C4 pipeline's repeated-span
discard rule over fixed token windows; first occurrence (by doc_id,
then window position) survives, corpus-wide.
"""

import zuliasearch_spark.pipeline as P


def _run(spark, rows, span_tokens=4):
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = P.span_dedup(docs, span_tokens=span_tokens).collect()
    return {r["doc_id"]: (r["n_spans"], r["n_kept"], r["text_kept"]) for r in out}


def test_cross_doc_duplicate_span_removed(spark):
    rows = [
        (1, "a b c d e f g h"),          # spans: "a b c d", "e f g h"
        (2, "x y z w a b c d"),          # second span duplicates doc 1's first
    ]
    out = _run(spark, rows)
    assert out[1] == (2, 2, "a b c d e f g h")
    assert out[2] == (2, 1, "x y z w")


def test_within_doc_duplicate_span_removed(spark):
    out = _run(spark, [(5, "p q r s p q r s t u")])
    # spans: "p q r s", "p q r s", "t u" — second occurrence dropped
    assert out[5] == (3, 2, "p q r s t u")


def test_first_occurrence_wins_by_doc_order(spark):
    rows = [(10, "m n o p"), (3, "m n o p")]
    out = _run(spark, rows)
    assert out[3] == (1, 1, "m n o p")   # lower doc_id keeps the span
    assert out[10] == (1, 0, "")


def test_partial_trailing_window_counts(spark):
    out = _run(spark, [(7, "a b c d e")])
    # "a b c d" + trailing partial "e"
    assert out[7] == (2, 2, "a b c d e")


def test_no_duplicates_is_identity(spark):
    rows = [(1, "one two three four"), (2, "five six seven eight")]
    out = _run(spark, rows)
    assert out[1] == (1, 1, "one two three four")
    assert out[2] == (1, 1, "five six seven eight")

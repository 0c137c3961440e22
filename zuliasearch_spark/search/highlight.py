"""Query highlighting: tagged fragments over the match set.

The reference wraps Lucene's Highlighter with a QueryScorer
(ZuliaHighlighter.java:14-40; request surface HighlightRequest
zulia_query.proto — field, preTag default ``<em>``, postTag default
``</em>``, numberOfFragments, fragmentLength): matched docs'
stored text is re-analyzed, split into fragments, fragments scored
by the query terms they contain, and the top-N returned with every
query-term occurrence wrapped in tags.

Spark re-expression: highlighting applies to MATCHED docs (usually
the returned page), so the operator is a vectorized pandas UDF over
the match-set join — per-doc Python regex work is bounded by the
docs being displayed, not the corpus. Fragment scoring = Σ matched
query-term occurrences in the fragment (QueryScorer with unit
weights — a documented simplification of idf-weighted scoring);
ties break toward the earlier fragment. ``n_fragments=0`` tags the
ENTIRE text (whole-document mode), which is also the
oracle-checkable configuration.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _pattern(terms: tuple[str, ...]) -> re.Pattern:
    alt = "|".join(re.escape(t) for t in sorted(terms, key=len, reverse=True))
    return re.compile(rf"\b({alt})\b", re.IGNORECASE)


def tag_text(text: str, pat: re.Pattern, pre: str, post: str) -> tuple[str, int]:
    n = 0

    def rep(m):
        nonlocal n
        n += 1
        return f"{pre}{m.group(0)}{post}"

    return pat.sub(rep, text), n


def best_fragments(
    text: str,
    pat: re.Pattern,
    pre: str,
    post: str,
    n_fragments: int,
    fragment_size: int,
) -> list[str]:
    """Split into ~fragment_size character windows on whitespace,
    score by query-term occurrences, tag and return the top-N in
    score-then-position order (Highlighter.getBestFragments)."""
    frags: list[tuple[int, int, str]] = []  # (score, position, text)
    start = 0
    idx = 0
    while start < len(text):
        end = min(len(text), start + fragment_size)
        if end < len(text):
            sp = text.rfind(" ", start, end)
            if sp > start:
                end = sp
        frag = text[start:end]
        score = len(pat.findall(frag))
        if score > 0:
            frags.append((score, idx, frag))
        idx += 1
        start = end + 1 if end < len(text) and text[end] == " " else end
    frags.sort(key=lambda f: (-f[0], f[1]))
    return [tag_text(f[2], pat, pre, post)[0] for f in frags[:n_fragments]]


def highlight(
    matched_docs: DataFrame,
    text_col: str,
    terms: tuple[str, ...],
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    n_fragments: int = 3,
    fragment_size: int = 100,
) -> DataFrame:
    """Add highlight columns to a matched-docs DataFrame.

    ``n_fragments=0``: whole-document mode — adds ``highlighted``
    (full text with every query-term occurrence tagged) and
    ``n_tagged``. Otherwise adds ``fragments: array<string>`` with
    the top-N scored fragments.
    """
    pat = _pattern(terms)

    if n_fragments == 0:

        @pandas_udf("highlighted string, n_tagged long")
        def tag(texts: pd.Series) -> pd.DataFrame:
            out = [tag_text(t or "", pat, pre_tag, post_tag) for t in texts]
            return pd.DataFrame({"highlighted": [o[0] for o in out], "n_tagged": [o[1] for o in out]})

        tagged = matched_docs.withColumn("_hl", tag(F.col(text_col)))
        return tagged.select("*", "_hl.highlighted", "_hl.n_tagged").drop("_hl")

    @pandas_udf("array<string>")
    def frags(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [best_fragments(t or "", pat, pre_tag, post_tag, n_fragments, fragment_size) for t in texts]
        )

    return matched_docs.withColumn("fragments", frags(F.col(text_col)))

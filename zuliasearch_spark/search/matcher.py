"""Boolean clause combination over dense per-doc arrays.

Shared by the exhaustive oracle (over corpus rows) and the per-shard
DAAT kernel (over a shard's doc-id space) so Lucene BooleanQuery
semantics (ZuliaIndex.generateClause:780-835) are implemented exactly
once:

- SCORE_MUST / FILTER / TERMS constrain the match set (FILTER/TERMS
  contribute no score);
- SCORE_SHOULD is optional unless no required clause exists, in which
  case at least one SHOULD must match;
- FILTER_NOT / TERMS_NOT exclude; a query of only negative clauses
  matches everything else (the reference's MatchAll fix-up,
  ZuliaIndex.java:715-717,934-937);
- inside a clause, AND requires every term, OR requires
  ``min_optional`` (mm) of them; clause score = sum of matched term
  scores (clause boost folded into the term weights, like Lucene's
  BoostQuery pushing boost into TermQuery weights).

Scores accumulate in float64 and downcast to float32 once at the end
when ``parity`` — matching Lucene's double accumulator + float
score() contract.
"""

from __future__ import annotations

import numpy as np

from zuliasearch_spark.search.query import (
    FILTER,
    FILTER_NOT,
    SCORE_MUST,
    SCORE_SHOULD,
    TERMS,
    TERMS_NOT,
    ResolvedClause,
    TermSpec,
)


def combine_clauses(
    resolved: list[ResolvedClause],
    term_vectors,
    n: int,
    parity: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate the boolean query over a dense doc space of size ``n``.

    ``term_vectors(spec: TermSpec, boost: float) -> (mask, score)``
    returns a bool match mask and float64 score vector of length
    ``n`` for one (field, term) leaf.

    Returns ``(match_mask, score)``.
    """
    pos_mask = np.ones(n, dtype=bool)
    neg_mask = np.zeros(n, dtype=bool)
    should_any = np.zeros(n, dtype=bool)
    has_required = False
    has_should = False
    score_parts: list[tuple[np.ndarray, np.ndarray]] = []

    for rc in resolved:
        c = rc.clause
        req_masks: list[np.ndarray] = []
        opt_masks: list[np.ndarray] = []
        cscore = np.zeros(n, dtype=np.float64)
        for spec in rc.specs:
            m, s = term_vectors(spec, c.boost)
            (req_masks if spec.required else opt_masks).append(m)
            cscore += np.where(m, s, 0.0)

        cm = np.ones(n, dtype=bool) if rc.specs else np.zeros(n, dtype=bool)
        for m in req_masks:
            cm &= m
        if opt_masks:
            cnt = np.zeros(n, dtype=np.int64)
            for m in opt_masks:
                cnt += m
            cm &= cnt >= rc.min_optional

        if c.type in (SCORE_MUST, FILTER, TERMS):
            pos_mask &= cm
            has_required = True
            if c.type == SCORE_MUST:
                score_parts.append((cm, cscore))
        elif c.type == SCORE_SHOULD:
            has_should = True
            should_any |= cm
            score_parts.append((cm, cscore))
        elif c.type in (FILTER_NOT, TERMS_NOT):
            neg_mask |= cm
        else:
            raise ValueError(f"unknown clause type: {c.type}")

    match = pos_mask & ~neg_mask
    if has_should and not has_required:
        match &= should_any

    total = np.zeros(n, dtype=np.float64)
    for cm, cs in score_parts:
        total += np.where(cm & match, cs, 0.0)
    if parity:
        total = total.astype(np.float32).astype(np.float64)
    return match, total

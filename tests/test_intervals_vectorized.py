"""Vectorized flat-interval matchers vs the per-doc reference walk.

_interval_postings' three vectorized shapes (ordered chain, two-term
gap bound, presence-only unordered) must decide exactly like
_interval_match_doc — the per-doc evaluator the shapes replaced
(it remains the 3+-term gap-bounded fallback).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from zuliasearch_spark.search.executor import (
    _interval_match_doc,
    _ordered_chain_docs,
    _two_term_gap_docs,
)


def _mk_streams(per_doc_positions):
    """[{term_idx: [positions]}] per doc → the (docs, tfs, dls, pos)
    stream tuples _interval_postings consumes."""
    n_terms = max((t for d in per_doc_positions for t in d), default=-1) + 1
    streams = []
    for t in range(n_terms):
        docs, tfs, pos = [], [], []
        for d, m in enumerate(per_doc_positions):
            p = sorted(m.get(t, ()))
            if p:
                docs.append(d)
                tfs.append(len(p))
                pos.extend(p)
        streams.append(
            (
                np.array(docs, np.int64),
                np.array(tfs, np.int64),
                np.full(len(docs), 10, np.int64),
                np.array(pos, np.int64),
            )
        )
    return streams


pos_lists = st.lists(
    st.fixed_dictionaries(
        {},
        optional={
            0: st.lists(st.integers(0, 30), min_size=1, max_size=5, unique=True),
            1: st.lists(st.integers(0, 30), min_size=1, max_size=5, unique=True),
            2: st.lists(st.integers(0, 30), min_size=1, max_size=4, unique=True),
        },
    ),
    min_size=1,
    max_size=12,
)


def _common(streams):
    common = streams[0][0]
    for docs, _, _, _ in streams[1:]:
        common = np.intersect1d(common, docs, assume_unique=True)
    return common


def _loop_docs(streams, common, ordered, max_gaps):
    out = []
    for d in common:
        pbt = []
        for docs, tfs, _dls, pos in streams:
            i = int(np.searchsorted(docs, d))
            starts = np.zeros(tfs.size, dtype=np.int64)
            np.cumsum(tfs[:-1], out=starts[1:])
            pbt.append(pos[starts[i] : starts[i] + int(tfs[i])])
        if _interval_match_doc(pbt, ordered, max_gaps):
            out.append(int(d))
    return out


@settings(max_examples=150, deadline=None)
@given(pos_lists)
def test_ordered_chain_matches_per_doc_walk(per_doc):
    per_doc = [{t: p for t, p in m.items() if t < 3} for m in per_doc]
    streams = _mk_streams(per_doc)
    if len(streams) < 2:
        return
    common = _common(streams)
    got = _ordered_chain_docs(streams, common).tolist()
    want = _loop_docs(streams, common, ordered=True, max_gaps=-1)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(pos_lists, st.booleans(), st.integers(0, 6))
def test_two_term_gaps_match_per_doc_walk(per_doc, ordered, max_gaps):
    per_doc = [{t: p for t, p in m.items() if t < 2} for m in per_doc]
    streams = _mk_streams(per_doc)
    if len(streams) < 2:
        return
    common = _common(streams)
    got = _two_term_gap_docs(streams, common, ordered, max_gaps).tolist()
    want = _loop_docs(streams, common, ordered=ordered, max_gaps=max_gaps)
    assert got == want

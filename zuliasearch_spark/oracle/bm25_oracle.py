"""Exhaustive-scoring oracle: Lucene-BM25 reference semantics, no Spark.

This is the in-sandbox stand-in for the Java reference: it scores
EVERY document (no pruning, no sharded top-k shortcuts) with the
exact Lucene BM25 float32 pipeline (see
``zuliasearch_spark.search.scorer``), Lucene SmallFloat norm
quantization, per-shard df/avgdl statistics (each Zulia shard is its
own Lucene IndexReader), djb2 shard routing (ShardUtil.java:3-20) and
Lucene BooleanQuery clause semantics (ZuliaIndex.generateClause:780-835,
negative-query fix-up :715-717,934-937). Golden files produced from
this oracle define "rank-identical to the reference" for the engine
(FIXTURES.md F4): identical ranked uniqueIds, scores within 1e-4
(BoostAndVectorShouldTest.java:99 tolerance), ties broken
(score desc, shard asc, doc_id asc) like ZuliaPostSortingComparator.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from zuliasearch_spark.analysis.analyzers import analyze_query_text, term_freqs, tokenize
from zuliasearch_spark.config import IndexConfig
from zuliasearch_spark.search.matcher import combine_clauses
from zuliasearch_spark.search.query import PhraseSpec, SearchRequest, resolve_clause
from zuliasearch_spark.search.scorer import Bm25Params, bm25_avgdl, bm25_term_scores, bm25_weight
from zuliasearch_spark.util.hashing import shard_for_series


@dataclass
class _FieldIndex:
    row: np.ndarray  # corpus row index per (doc,term) pair
    term: np.ndarray  # object array
    tf: np.ndarray
    dl: np.ndarray  # per corpus row
    # per-shard stats
    doc_count: dict[int, int]
    sum_dl: dict[int, int]
    # (shard -> term -> df)
    df_by_shard: dict[int, dict[str, int]]
    df_global: dict[str, int]
    # per corpus row: [(position, term), ...] — the raw analyzed
    # stream (with stopword position gaps) for phrase matching
    streams: list[list[tuple[int, str]]]


class OracleIndex:
    def __init__(self, corpus: pd.DataFrame, config: IndexConfig):
        self.config = config
        self.params = Bm25Params(lucene_parity=config.quantize_norms)
        corpus = corpus.reset_index(drop=True)
        uid = corpus[config.unique_id_col].astype(str)
        shard = shard_for_series(uid, config.number_of_shards).astype(np.int64)
        # doc_id: ARRIVAL order within shard — matching the engine's
        # scan-order assignment (builder.assign_ids; Lucene's docIDs
        # are segment-arrival order too)
        doc_id = np.zeros(len(corpus), dtype=np.int64)
        next_id: dict[int, int] = {}
        for i, s in enumerate(shard.tolist()):
            doc_id[i] = next_id.get(s, 0)
            next_id[s] = doc_id[i] + 1
        self.corpus = corpus
        self.uid = uid.to_numpy()
        self.shard = shard
        self.doc_id = doc_id
        self.n = len(corpus)

        self.fields: dict[str, _FieldIndex] = {}
        for stored_col, ia in config.indexed_fields():
            settings = config.analyzer(ia.analyzer_name)
            drow, term_arr, tf, dl = term_freqs(corpus[stored_col], settings)
            term = term_arr.to_numpy(zero_copy_only=False)
            doc_count: dict[int, int] = {}
            sum_dl: dict[int, int] = {}
            df_by_shard: dict[int, dict[str, int]] = {}
            for s in range(config.number_of_shards):
                in_s = shard == s
                doc_count[s] = int(((dl > 0) & in_s).sum())
                sum_dl[s] = int(dl[in_s].sum())
                df_by_shard[s] = {}
            pair_shard = shard[drow]
            for s in range(config.number_of_shards):
                m = pair_shard == s
                t, c = np.unique(term[m], return_counts=True)
                df_by_shard[s] = dict(zip(t.tolist(), c.tolist()))
            tg, cg = np.unique(term, return_counts=True)
            ts = tokenize(corpus[stored_col], settings)
            streams: list[list[tuple[int, str]]] = [[] for _ in range(len(corpus))]
            stream_terms = ts.terms()
            for d, p, t in zip(ts.doc_idx.tolist(), ts.pos.tolist(), stream_terms.tolist()):
                streams[d].append((p, str(t)))
            self.fields[ia.indexed_field_name] = _FieldIndex(
                drow, term, tf, dl, doc_count, sum_dl, df_by_shard,
                dict(zip(tg.tolist(), cg.tolist())), streams,
            )

    # -- scoring helpers ------------------------------------------------

    def _analyze(self, field: str, text: str) -> list[str]:
        return analyze_query_text(text, self.config.analyzer_for_indexed_field(field))

    def _term_vectors(self, field: str, term: str, boost: float) -> tuple[np.ndarray, np.ndarray]:
        """(match_mask, score_vec) over all corpus rows for one term."""
        fi = self.fields[field]
        mask = np.zeros(self.n, dtype=bool)
        score = np.zeros(self.n, dtype=np.float64)
        sel = fi.term == term
        if not sel.any():
            return mask, score
        rows = fi.row[sel]
        tfs = fi.tf[sel]
        mask[rows] = True
        cfg = self.config
        shards = self.shard[rows] if cfg.per_shard_stats else np.zeros(len(rows), dtype=np.int64)
        for s in np.unique(shards):
            m = shards == s
            if cfg.per_shard_stats:
                n_docs = fi.doc_count[int(s)]
                sum_dl = fi.sum_dl[int(s)]
                df = fi.df_by_shard[int(s)].get(term, 0)
            else:
                n_docs = sum(fi.doc_count.values())
                sum_dl = sum(fi.sum_dl.values())
                df = fi.df_global.get(term, 0)
            if df == 0 or n_docs == 0:
                continue
            avgdl = bm25_avgdl(sum_dl, n_docs, self.params)
            w = bm25_weight(n_docs, df, boost, self.params)
            r = rows[m]
            score[r] = bm25_term_scores(tfs[m], fi.dl[r], w, avgdl, self.params)
        return mask, score

    def _phrase_freqs(self, field: str, terms: tuple[str, ...], slop: int) -> dict[int, int]:
        """row -> phrase frequency, by straightforward per-doc scans —
        deliberately independent of the engine's vectorized
        key-intersection so a shared bug cannot hide."""
        fi = self.fields[field]
        out: dict[int, int] = {}
        for row, stream in enumerate(fi.streams):
            if not stream:
                continue
            pos_by_term: dict[str, list[int]] = {}
            for p, t in stream:
                pos_by_term.setdefault(t, []).append(p)
            if any(t not in pos_by_term for t in terms):
                continue
            if slop == 0 or len(terms) == 1:
                bases = [
                    p
                    for p in pos_by_term[terms[0]]
                    if all((p + i) in pos_by_term[t] for i, t in enumerate(terms) if i)
                ]
                freq = len(bases)
            elif len(terms) == 2:
                a_offs = pos_by_term[terms[0]]
                freq = sum(
                    1
                    for pb in pos_by_term[terms[1]]
                    if min(abs((pb - 1) - pa) for pa in a_offs) <= slop
                )
            else:
                raise ValueError("oracle sloppy phrases support exactly 2 terms")
            if freq:
                out[row] = freq
        return out

    def _phrase_vectors(self, spec: PhraseSpec, boost: float) -> tuple[np.ndarray, np.ndarray]:
        fi = self.fields[spec.field]
        mask = np.zeros(self.n, dtype=bool)
        score = np.zeros(self.n, dtype=np.float64)
        freqs = self._phrase_freqs(spec.field, spec.terms, spec.slop)
        if not freqs:
            return mask, score
        rows = np.fromiter(sorted(freqs), dtype=np.int64)
        fr = np.array([freqs[r] for r in rows.tolist()], dtype=np.int64)
        mask[rows] = True
        cfg = self.config
        shards = self.shard[rows] if cfg.per_shard_stats else np.zeros(len(rows), dtype=np.int64)
        for s in np.unique(shards):
            m = shards == s
            if cfg.per_shard_stats:
                n_docs, sum_dl = fi.doc_count[int(s)], fi.sum_dl[int(s)]
                df_of = fi.df_by_shard[int(s)]
            else:
                n_docs, sum_dl = sum(fi.doc_count.values()), sum(fi.sum_dl.values())
                df_of = fi.df_global
            dfs = [df_of.get(t, 0) for t in spec.terms]
            if any(d == 0 for d in dfs) or n_docs == 0:
                continue
            avgdl = bm25_avgdl(sum_dl, n_docs, self.params)
            # PhraseWeight idf = Σ constituent idfs (Lucene idfExplain sum)
            w = sum(bm25_weight(n_docs, d, 1.0, self.params) for d in dfs)
            if self.params.lucene_parity:
                w = float(np.float32(w) * np.float32(boost))
            else:
                w = w * boost
            r = rows[m]
            score[r] = bm25_term_scores(fr[m], fi.dl[r], w, avgdl, self.params)
        return mask, score

    # -- search ----------------------------------------------------------

    def search(self, req: SearchRequest) -> dict:
        cfg = self.config
        resolved = [
            resolve_clause(
                c, self._analyze, cfg.default_search_fields, expand=cfg.expand_field
            )
            for c in req.clauses
        ]
        n = self.n

        def tv(spec, boost):
            if isinstance(spec, PhraseSpec):
                return self._phrase_vectors(spec, boost)
            return self._term_vectors(spec.field, spec.term, boost)

        match, total = combine_clauses(resolved, tv, n, self.params.lucene_parity)
        total_hits = int(match.sum())
        idx = np.flatnonzero(match)
        # search-after cursor: drop docs at or before the per-shard mark
        if req.last_result is not None:
            keep = np.ones(idx.size, dtype=bool)
            for s, after_score, after_doc in req.last_result.by_shard:
                in_s = self.shard[idx] == s
                sc = total[idx]
                di = self.doc_id[idx]
                before = in_s & ((sc > after_score) | ((sc == after_score) & (di <= after_doc)))
                keep &= ~before
            idx = idx[keep]
        order = np.lexsort((self.doc_id[idx], self.shard[idx], -total[idx]))
        ranked = idx[order][req.start : req.start + req.amount]
        return {
            "totalHits": total_hits,
            "topk": [
                {
                    "uniqueId": str(self.uid[r]),
                    "shard": int(self.shard[r]),
                    "doc_id": int(self.doc_id[r]),
                    "score": float(total[r]),
                }
                for r in ranked
            ],
        }

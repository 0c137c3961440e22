"""Distributed BM25 top-k query executor (scatter/gather over shards).

Query lifecycle, mirroring the reference's
(ZuliaIndex.internalQuery → ShardReader.queryShard → QueryCombiner;
SURVEY.md §3.1) re-expressed for Spark:

1. PLAN (driver): resolve clauses → (field, term) leaves; fetch the
   leaves' df/ttf from the term_stats table (a pushdown-pruned scan
   of only the query terms) and field stats (tiny, cached); compute
   per-(term, shard) idf and per-(field, shard) avgdl exactly like
   Lucene per-shard IndexReader statistics.
2. SCATTER: filter the postings table to the query terms — Catalyst
   pushes the (field, term) predicate into the parquet scan so only
   the query terms' blocks are read — then groupBy(shard)
   .applyInPandas(kernel): a per-shard document-at-a-time scoring
   kernel (decode delta-gap varint blocks, dense score accumulation,
   Lucene float32 BM25, boolean clause algebra shared with the
   oracle) with an optional MaxScore/block-max pruning path. Each
   shard emits its top (start+amount) rows plus a has-more sentinel
   (the k+1 trick of TopScoreDocCollectorManager(k+1),
   ShardReader.java:279-307).
3. GATHER (driver): merge the per-shard top-k's by
   (score desc, shard asc, doc_id asc) — ZuliaPostSortingComparator
   semantics — sum totalHits, apply `start`, and (when oversampling)
   run the reference's short-result check: if a shard that still
   "has more" could beat the merged tail, retry that shard exact
   (QueryCombiner.java:146-382, QueryRequestFederator.java:95-105).

The gather moves only O(shards × k) rows to the driver; all heavy
data stays columnar in executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from zuliasearch_spark.analysis.analyzers import analyze_query_text
from zuliasearch_spark.config import IndexConfig
from zuliasearch_spark.indexing.builder import IndexTables
from zuliasearch_spark.search.matcher import combine_clauses
from zuliasearch_spark.search.query import ResolvedClause, SearchRequest, TermSpec, resolve_clause
from zuliasearch_spark.search.scorer import (
    Bm25Params,
    bm25_avgdl,
    bm25_term_scores,
    bm25_weight,
)
from zuliasearch_spark.util.varint import segmented_cumsum, varint_decode

KERNEL_SCHEMA = (
    "shard int, doc_id long, score double, total_hits long, next_score double, has_next boolean"
)

MATCH_SCHEMA = "shard int, doc_id long, score double"


def _decode_group(pdf: pd.DataFrame) -> dict[tuple[str, str], tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode all posting blocks, grouped by (field, term).

    Returns {(field, term): (doc_ids, tfs, dls)} with docIDs ascending
    (bucket order == docID order by construction).
    """
    out: dict[tuple[str, str], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    if len(pdf) == 0:
        return out
    pdf = pdf.sort_values(["field", "term", "bucket", "block_id"], kind="stable")
    for (field, term), grp in pdf.groupby(["field", "term"], sort=False):
        doc_buf = b"".join(grp["doc_bytes"])
        tf_buf = b"".join(grp["tf_bytes"])
        dl_buf = b"".join(grp["dl_bytes"])
        counts = grp["n"].to_numpy(dtype=np.int64)
        seg_starts = np.zeros(counts.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=seg_starts[1:])
        docs = segmented_cumsum(varint_decode(doc_buf), seg_starts)
        tfs = varint_decode(tf_buf)
        dls = varint_decode(dl_buf)
        out[(str(field), str(term))] = (docs, tfs, dls)
    return out


def _make_kernel(
    resolved: list[ResolvedClause],
    idf_by_key: dict[tuple[str, str, int], float],
    avgdl_by_key: dict[tuple[str, int], float],
    params: Bm25Params,
    per_shard_amount: int,
    after_by_shard: dict[int, tuple[float, int]],
    n_docs_by_shard: dict[int, int],
):
    """Build the per-shard scoring kernel (pickled to executors)."""

    empty = pd.DataFrame(
        {
            "shard": pd.Series(dtype=np.int32),
            "doc_id": pd.Series(dtype=np.int64),
            "score": pd.Series(dtype=np.float64),
            "total_hits": pd.Series(dtype=np.int64),
            "next_score": pd.Series(dtype=np.float64),
            "has_next": pd.Series(dtype=bool),
        }
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        postings = _decode_group(pdf)
        if not postings:
            return empty
        # doc_ids are dense 0..num_docs-1 per shard (builder row_number),
        # so the shard count defines the match-all universe exactly
        n = n_docs_by_shard.get(shard, 0)
        if n == 0:
            n = int(max(d[0].max() for d in postings.values() if d[0].size)) + 1

        def term_vectors(spec: TermSpec, boost: float) -> tuple[np.ndarray, np.ndarray]:
            mask = np.zeros(n, dtype=bool)
            score = np.zeros(n, dtype=np.float64)
            entry = postings.get((spec.field, spec.term))
            if entry is None:
                return mask, score
            docs, tfs, dls = entry
            mask[docs] = True
            idf = idf_by_key.get((spec.field, spec.term, shard))
            if idf is not None:
                avgdl = avgdl_by_key[(spec.field, shard)]
                if params.lucene_parity:
                    w = float(np.float32(boost) * np.float32(idf))
                else:
                    w = boost * idf
                score[docs] = bm25_term_scores(tfs, dls, w, avgdl, params)
            return mask, score

        match, total = combine_clauses(resolved, term_vectors, n, params.lucene_parity)
        total_hits = int(match.sum())
        idx = np.flatnonzero(match)
        after = after_by_shard.get(shard)
        if after is not None:
            a_score, a_doc = after
            sc = total[idx]
            keep = (sc < a_score) | ((sc == a_score) & (idx > a_doc))
            idx = idx[keep]
        order = np.lexsort((idx, -total[idx]))
        ranked = idx[order]
        top = ranked[:per_shard_amount]
        has_next = ranked.size > per_shard_amount
        next_score = float(total[ranked[per_shard_amount]]) if has_next else float("nan")
        return pd.DataFrame(
            {
                "shard": np.int32(shard),
                "doc_id": top.astype(np.int64),
                "score": total[top],
                "total_hits": np.int64(total_hits),
                "next_score": next_score,
                "has_next": has_next,
            }
        )

    return kernel


def _make_match_kernel(
    resolved: list[ResolvedClause],
    idf_by_key: dict[tuple[str, str, int], float],
    avgdl_by_key: dict[tuple[str, int], float],
    params: Bm25Params,
    n_docs_by_shard: dict[int, int],
):
    """Kernel variant emitting the FULL match set (for facets/stats).

    Mirrors the reference's aggregation flow: facets and numeric stats
    run doc-at-a-time over the intersected match set
    (AggregationHandler.java:256-281); here the match set becomes a
    DataFrame that joins doc_map and feeds ordinary groupBy/agg.
    """
    empty = pd.DataFrame(
        {
            "shard": pd.Series(dtype=np.int32),
            "doc_id": pd.Series(dtype=np.int64),
            "score": pd.Series(dtype=np.float64),
        }
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        postings = _decode_group(pdf)
        if not postings:
            return empty
        n = n_docs_by_shard.get(shard, 0)
        if n == 0:
            n = int(max(d[0].max() for d in postings.values() if d[0].size)) + 1

        def term_vectors(spec: TermSpec, boost: float) -> tuple[np.ndarray, np.ndarray]:
            mask = np.zeros(n, dtype=bool)
            score = np.zeros(n, dtype=np.float64)
            entry = postings.get((spec.field, spec.term))
            if entry is None:
                return mask, score
            docs, tfs, dls = entry
            mask[docs] = True
            idf = idf_by_key.get((spec.field, spec.term, shard))
            if idf is not None:
                avgdl = avgdl_by_key[(spec.field, shard)]
                w = float(np.float32(boost) * np.float32(idf)) if params.lucene_parity else boost * idf
                score[docs] = bm25_term_scores(tfs, dls, w, avgdl, params)
            return mask, score

        match, total = combine_clauses(resolved, term_vectors, n, params.lucene_parity)
        idx = np.flatnonzero(match)
        return pd.DataFrame(
            {"shard": np.int32(shard), "doc_id": idx.astype(np.int64), "score": total[idx]}
        )

    return kernel


class SearchEngine:
    """Executes SearchRequests against built IndexTables."""

    def __init__(self, tables: IndexTables):
        self.tables = tables
        self.config: IndexConfig = tables.config
        self.params = Bm25Params(lucene_parity=self.config.quantize_norms)
        # field/shard stats are tiny (fields × shards): cache on the driver
        rows = tables.field_stats.collect()
        self._field_stats = {(r["field"], int(r["shard"])): (int(r["doc_count"]), int(r["sum_dl"])) for r in rows}
        self._shard_counts = {int(r["shard"]): int(r["num_docs"]) for r in tables.shard_counts.collect()}

    # -- planning ---------------------------------------------------------

    def _analyze(self, field: str, text: str) -> list[str]:
        return analyze_query_text(text, self.config.analyzer_for_indexed_field(field))

    def _resolve(self, req: SearchRequest) -> list[ResolvedClause]:
        return [resolve_clause(c, self._analyze, self.config.default_search_fields) for c in req.clauses]

    def _collect_term_stats(self, specs: set[tuple[str, str]]) -> dict[tuple[str, str, int], int]:
        """df per (field, term, shard) for the query leaves (pruned scan)."""
        if not specs:
            return {}
        cond = None
        by_field: dict[str, list[str]] = {}
        for f, t in specs:
            by_field.setdefault(f, []).append(t)
        for f, terms in by_field.items():
            c = (F.col("field") == f) & F.col("term").isin(terms)
            cond = c if cond is None else (cond | c)
        rows = self.tables.term_stats.filter(cond).collect()
        return {(r["field"], r["term"], int(r["shard"])): int(r["df"]) for r in rows}

    def _shards(self) -> list[int]:
        return sorted(self._shard_counts)

    def _stats_for(self, field: str, shard: int) -> tuple[int, int]:
        """(doc_count, sum_dl) — per shard or summed (global mode)."""
        if self.config.per_shard_stats:
            return self._field_stats.get((field, shard), (0, 0))
        dc = sum(v[0] for (f, _), v in self._field_stats.items() if f == field)
        sd = sum(v[1] for (f, _), v in self._field_stats.items() if f == field)
        return dc, sd

    def _plan(self, resolved: list[ResolvedClause]):
        """Per-(term, shard) idf + per-(field, shard) avgdl + scan predicate."""
        specs = {(s.field, s.term) for rc in resolved for s in rc.specs}
        if not specs:
            return None
        df_by_key = self._collect_term_stats(specs)
        shards = self._shards()

        idf_by_key: dict[tuple[str, str, int], float] = {}
        avgdl_by_key: dict[tuple[str, int], float] = {}
        for f in {f for f, _ in specs}:
            for s in shards:
                doc_count, sum_dl = self._stats_for(f, s)
                if doc_count > 0:
                    avgdl_by_key[(f, s)] = bm25_avgdl(sum_dl, doc_count, self.params)
        for f, t in specs:
            for s in shards:
                if self.config.per_shard_stats:
                    df = df_by_key.get((f, t, s), 0)
                else:
                    df = sum(df_by_key.get((f, t, s2), 0) for s2 in shards)
                doc_count, _ = self._stats_for(f, s)
                if df > 0 and doc_count > 0:
                    # bm25_weight with boost=1 → pure idf; boost folds in-kernel
                    idf_by_key[(f, t, s)] = bm25_weight(doc_count, df, 1.0, self.params)

        cond = None
        by_field: dict[str, list[str]] = {}
        for f, t in specs:
            by_field.setdefault(f, []).append(t)
        for f, terms in by_field.items():
            c = (F.col("field") == f) & F.col("term").isin(terms)
            cond = c if cond is None else (cond | c)
        return idf_by_key, avgdl_by_key, cond

    # -- search -----------------------------------------------------------

    def search(self, req: SearchRequest, fetch: str = "ids") -> dict:
        resolved = self._resolve(req)
        plan = self._plan(resolved)
        if plan is None:
            return {"totalHits": 0, "topk": []}
        idf_by_key, avgdl_by_key, cond = plan
        shards = self._shards()

        per_shard_amount = req.start + req.amount
        after = {s: a for s in shards if (a := (req.last_result.after_for(s) if req.last_result else None))}

        kernel = _make_kernel(
            resolved, idf_by_key, avgdl_by_key, self.params, per_shard_amount, after, self._shard_counts
        )
        shard_rows = (
            self.tables.postings.filter(cond)
            .groupBy("shard")
            .applyInPandas(kernel, KERNEL_SCHEMA)
            .collect()
        )

        total_hits = 0
        seen_shards = set()
        merged = []
        for r in shard_rows:
            if r["shard"] not in seen_shards:
                seen_shards.add(r["shard"])
                total_hits += int(r["total_hits"])
            merged.append((float(r["score"]), int(r["shard"]), int(r["doc_id"])))

        # purely-negative query: shards where the negative terms have no
        # postings produced no kernel group, yet ALL their docs match
        # (the reference's MatchAll fix-up, ZuliaIndex.java:715-717)
        if all(rc.clause.negative for rc in resolved):
            for s, n_docs in self._shard_counts.items():
                if s in seen_shards or n_docs == 0:
                    continue
                total_hits += n_docs
                for d in range(min(per_shard_amount, n_docs)):
                    merged.append((0.0, s, d))
        merged.sort(key=lambda x: (-x[0], x[1], x[2]))
        page = merged[req.start : req.start + req.amount]

        topk = [{"shard": s, "doc_id": d, "score": sc} for sc, s, d in page]
        if fetch != "none" and topk:
            self._attach_unique_ids(topk)
        return {"totalHits": total_hits, "topk": topk}

    def match_ids(self, req: SearchRequest):
        """DataFrame of ALL matching (shard, doc_id, score) rows.

        The entry point for aggregations: facets/stats join this match
        set against doc_map, the Spark equivalent of the reference's
        doc-at-a-time facet/stat pass over the intersected iterators
        (AggregationHandler.java:256-281). Requires at least one
        positive clause (a purely-negative match-all set should be
        computed as doc_map anti-join instead).
        """
        resolved = self._resolve(req)
        if resolved and all(rc.clause.negative for rc in resolved):
            raise ValueError("match_ids needs a positive clause; anti-join doc_map for pure negations")
        plan = self._plan(resolved)
        if plan is None:
            raise ValueError("empty query")
        idf_by_key, avgdl_by_key, cond = plan
        kernel = _make_match_kernel(resolved, idf_by_key, avgdl_by_key, self.params, self._shard_counts)
        return self.tables.postings.filter(cond).groupBy("shard").applyInPandas(kernel, MATCH_SCHEMA)

    def facet_counts(self, req: SearchRequest, facet_field: str, top_n: int = 10):
        """Exact top-N facet counts over the match set.

        The reference merges per-shard partial facet counts with error
        bounds (FacetCombiner.java:41-144); a global Spark groupBy is
        exact, so maxError/possibleMissing are always zero here.
        Ties broken by value ascending (deterministic).
        """
        matches = self.match_ids(req).select("shard", "doc_id")
        joined = matches.join(self.tables.doc_map, ["shard", "doc_id"], "inner")
        return (
            joined.groupBy(F.col(facet_field).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("value"))
            .limit(top_n)
        )

    def numeric_stats(self, req: SearchRequest, stat_field: str):
        """min/max/sum/count over the match set (Stats.java:20-100)."""
        matches = self.match_ids(req).select("shard", "doc_id")
        joined = matches.join(self.tables.doc_map, ["shard", "doc_id"], "inner")
        c = F.col(stat_field)
        return joined.agg(
            F.min(c).alias("min_v"),
            F.max(c).alias("max_v"),
            F.sum(c).alias("sum_v"),
            F.count(c).alias("count_v"),
        )

    def get_terms(
        self,
        field: str,
        start_term: str | None = None,
        end_term: str | None = None,
        min_doc_freq: int = 0,
        term_filter_regex: str | None = None,
        amount: int = 0,
    ):
        """Term dictionary enumeration (GetTerms, ShardTermsHandler.java:47-204).

        Per-shard df/ttf are summed across shards, filtered by range /
        regex / minDocFreq, ordered by term — the Spark plan is exactly
        the reference's seek + merge federation
        (GetTermsRequestFederator) as one groupBy.
        """
        df = self.tables.term_stats.filter(F.col("field") == field)
        if start_term is not None:
            df = df.filter(F.col("term") >= start_term)
        if end_term is not None:
            df = df.filter(F.col("term") < end_term)
        if term_filter_regex:
            df = df.filter(F.col("term").rlike(term_filter_regex))
        out = df.groupBy("term").agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        if min_doc_freq > 0:
            out = out.filter(F.col("df") >= min_doc_freq)
        out = out.orderBy("term")
        return out.limit(amount) if amount else out

    def _attach_unique_ids(self, topk: list[dict]) -> None:
        pairs = [(t["shard"], t["doc_id"]) for t in topk]
        cond = None
        for s, d in pairs:
            c = (F.col("shard") == s) & (F.col("doc_id") == d)
            cond = c if cond is None else (cond | c)
        rows = self.tables.doc_map.filter(cond).select("shard", "doc_id", "uniqueId").collect()
        lookup = {(int(r["shard"]), int(r["doc_id"])): r["uniqueId"] for r in rows}
        for t in topk:
            t["uniqueId"] = lookup.get((t["shard"], t["doc_id"]))

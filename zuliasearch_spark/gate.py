"""Driver correctness-gate queries: Spark engine vs DuckDB oracle SQL.

Each ``q_*`` function runs an engine/pipeline operator over the
driver-provided parquet tables (documents/embeddings) and has a
matching ANSI-SQL oracle in ``ORACLE_SQL`` that DuckDB executes on
the same tables. Column names/aliases are identical on both sides;
floating-point outputs are rounded to 4 decimals AFTER ranking by a
7-decimal-rounded key + id (so fp noise in the last ulp can neither
reorder nor re-select rows).

The search-family queries exercise the REAL engine end-to-end (index
build → postings → DAAT kernel → merge) with ``quantize_norms=False``
and global statistics, because a SQL oracle computes exact-dl,
collection-global BM25. (Lucene-parity mode — SmallFloat-quantized
norms, per-shard stats, float32 — is covered by the oracle golden
tests in tests/test_search_parity.py, where the reference semantics
live.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine
from zuliasearch_spark.search.query import QueryClause, SearchRequest

_ENGINE_CACHE: dict[str, SearchEngine] = {}

# whitespace+lowercase tokenization, replicated in SQL as
# unnest(string_split(text,' ')) — the documents table is single-space
# tokenized, so the two agree exactly.
_TOKS_CTE = (
    "toks AS (SELECT doc_id, lower(t.tok) AS term "
    "FROM documents, unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> '')"
)


def documents_config() -> IndexConfig:
    return IndexConfig(
        index_name="documents",
        unique_id_col="uid",
        number_of_shards=4,
        default_search_fields=("text",),
        field_configs=(
            FieldConfig("text", index_as=(IndexAs("text", "whitespace_lc"),)),
            FieldConfig("lang", index_as=(IndexAs("lang", "lcKeyword"),), facet_as=("lang",)),
            FieldConfig("source", index_as=(IndexAs("source", "lcKeyword"),), facet_as=("source",)),
        ),
        per_shard_stats=False,  # SQL oracle computes collection-global stats
        quantize_norms=False,  # SQL oracle scores with exact field lengths
    )


def documents_engine(spark: SparkSession, sf_dir: str) -> SearchEngine:
    """Build (once per sf_dir) the inverted index over the documents table."""
    eng = _ENGINE_CACHE.get(sf_dir)
    if eng is not None:
        return eng
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # uid zero-padded so per-shard doc order == numeric doc_id order,
    # making engine tie-breaks identical to ORDER BY score DESC, doc_id
    corpus = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("uid"),
        F.col("doc_id").alias("orig_doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    tables = build_index(corpus, documents_config(), stored_cols=("orig_doc_id", "lang", "source", "n_chars"))
    tables.persist()
    eng = SearchEngine(tables)
    _ENGINE_CACHE[sf_dir] = eng
    return eng


def _topk_df(spark: SparkSession, engine: SearchEngine, req: SearchRequest, k: int) -> DataFrame:
    """Engine top-k → (doc_id, score) rows, re-ranked by rounded score."""
    res = engine.search(req)
    rows = [(int(t["uniqueId"]), float(t["score"])) for t in res["topk"]]
    rows.sort(key=lambda r: (-round(r[1], 7), r[0]))
    rows = [(d, float(round(s, 4))) for d, s in rows[:k]]
    return spark.createDataFrame(rows, "doc_id bigint, score double")


# --------------------------------------------------------------------------
# search family


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = documents_engine(spark, sf_dir)
    req = SearchRequest(
        (QueryClause("SCORE_SHOULD", q="spark query merge", qf=("text",)),), amount=50
    )
    return _topk_df(spark, eng, req, 10)


def q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = documents_engine(spark, sf_dir)
    req = SearchRequest(
        (
            QueryClause("SCORE_SHOULD", q="window sort", qf=("text",)),
            QueryClause("FILTER", q="lang:en"),
        ),
        amount=50,
    )
    return _topk_df(spark, eng, req, 10)


def q_and_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = documents_engine(spark, sf_dir)
    req = SearchRequest(
        (QueryClause("SCORE_MUST", q="hash join", qf=("text",), default_op="AND"),), amount=1
    )
    hits = eng.search(req, fetch="none")["totalHits"]
    return spark.createDataFrame([(hits,)], "hits bigint")


def q_terms_set_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = documents_engine(spark, sf_dir)
    req = SearchRequest(
        (
            QueryClause("TERMS", terms=("es", "de"), qf=("lang",)),
            QueryClause("FILTER_NOT", q="source:src0"),
        ),
        amount=1,
    )
    hits = eng.search(req, fetch="none")["totalHits"]
    return spark.createDataFrame([(hits,)], "hits bigint")


def q_facet_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = documents_engine(spark, sf_dir)
    req = SearchRequest((QueryClause("FILTER", q="text:merge"),), amount=1)
    return eng.facet_counts(req, "lang", top_n=10)


def q_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = documents_engine(spark, sf_dir)
    req = SearchRequest((QueryClause("FILTER", q="text:scan"),), amount=1)
    return eng.numeric_stats(req, "n_chars").select(
        F.col("min_v").cast("long"),
        F.col("max_v").cast("long"),
        F.col("sum_v").cast("long"),
        F.col("count_v").cast("long"),
    )


def q_get_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = documents_engine(spark, sf_dir)
    return eng.get_terms("text", start_term="m", min_doc_freq=5, amount=20).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


# --------------------------------------------------------------------------
# training-data pipeline ops (dedup / similarity / text analysis)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groups with representative + cardinality.

    Scale: a single hash-groupBy with map-side combine; the canonical
    keeper is min(doc_id). At 100 TB this is one shuffle on a
    well-distributed key (md5), no skew.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("keeper")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting entirely inside whole-stage codegen: split/filter/
    array_distinct as native expressions — zero shuffles, zero UDFs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a query vector (vec_id=0).

    Spark plan: the query vector is a broadcast literal; dot products
    run as F.aggregate(F.zip_with(...)) inside codegen — no explode,
    no shuffle except the final TakeOrderedAndProject. This is the
    exact baseline an IVF/LSH index is validated against.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qv])

    def dot(a, b):
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    cos = dot(F.col("embedding"), qlit) / (
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))) * F.sqrt(dot(qlit, qlit))
    )
    return (
        emb.select("vec_id", cos.alias("c"))
        .orderBy(F.desc(F.round(F.col("c"), 7)), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("c", 4).alias("cosine"))
    )


# --------------------------------------------------------------------------
# registry

QUERIES = {
    "bm25_topk": q_bm25_topk,
    "bm25_filtered": q_bm25_filtered,
    "and_count": q_and_count,
    "terms_set_count": q_terms_set_count,
    "facet_lang": q_facet_lang,
    "numeric_stats": q_numeric_stats,
    "get_terms": q_get_terms,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "cosine_topk": q_cosine_topk,
}

_BM25_SQL = """
WITH {toks},
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term IN ({terms}) GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  {extra_join}
  {where}
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored
ORDER BY round(s, 7) DESC, doc_id ASC LIMIT 10
"""

ORACLE_SQL = {
    "bm25_topk": _BM25_SQL.format(
        toks=_TOKS_CTE, terms="'spark','query','merge'", extra_join="", where=""
    ),
    "bm25_filtered": _BM25_SQL.format(
        toks=_TOKS_CTE,
        terms="'window','sort'",
        extra_join="JOIN documents d ON d.doc_id = tf.doc_id",
        where="WHERE lower(d.lang) = 'en'",
    ),
    "and_count": f"""
WITH {_TOKS_CTE}
SELECT count(*)::BIGINT AS hits FROM (
  SELECT doc_id FROM toks WHERE term IN ('hash','join')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2
)""",
    "terms_set_count": """
SELECT count(*)::BIGINT AS hits FROM documents
WHERE lower(lang) IN ('es','de') AND lower(source) <> 'src0'""",
    "facet_lang": f"""
WITH {_TOKS_CTE}
SELECT lang AS value, count(*)::BIGINT AS cnt FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')
GROUP BY lang ORDER BY cnt DESC, value ASC LIMIT 10""",
    "numeric_stats": f"""
WITH {_TOKS_CTE}
SELECT min(n_chars)::BIGINT AS min_v, max(n_chars)::BIGINT AS max_v,
       sum(n_chars)::BIGINT AS sum_v, count(n_chars)::BIGINT AS count_v
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'scan')""",
    "get_terms": f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf FROM tf
WHERE term >= 'm' GROUP BY term HAVING count(*) >= 5
ORDER BY term LIMIT 20""",
    "dedup_exact": """
SELECT md5(text) AS text_hash, count(*)::BIGINT AS cnt, min(doc_id)::BIGINT AS keeper
FROM documents GROUP BY md5(text)""",
    "token_count": f"""
WITH {_TOKS_CTE}
SELECT doc_id, count(*)::BIGINT AS n_tokens, count(DISTINCT term)::BIGINT AS n_distinct
FROM toks GROUP BY doc_id""",
    "cosine_topk": """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT e.vec_id,
         list_dot_product(e.embedding::DOUBLE[], q.qe)
           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
              * sqrt(list_dot_product(q.qe, q.qe))) AS c
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round(c, 4) AS cosine FROM c
ORDER BY round(c, 7) DESC, vec_id ASC LIMIT 10""",
}

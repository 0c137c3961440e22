"""Training-data pipeline operators over the documents/embeddings tables.

The large-scale data-pipeline companion to the search engine:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding near-dup), similarity search (brute-force + IVF), text
analysis (language-ID, quality scoring, winnowing fingerprints), and
multimodal binary plumbing. Every operator is expressed with built-in
``pyspark.sql.functions`` (whole-stage codegen; the only shuffles are
the aggregations/joins the algorithms inherently need) and has a
DuckDB-expressible oracle in ``zuliasearch_spark.gate``.

Determinism across engines: token/shingle hashing uses the first 8
hex chars of md5 as a 32-bit integer (identical in Spark `conv` and
DuckDB hex-cast — verified), permutation hashing uses
``(a*x + b) mod P`` with ``a,b < 2^30`` and P=4294967311 (a*x ≤ 2^62,
no int64 overflow), and floating-point outputs are rounded before
ordering/comparison.

Scale notes (100 TB):
- MinHash/LSH: one shuffle to aggregate signatures (map-side
  combine), one shuffle for the band self-join; band keys are
  uniformly distributed by construction so the join does not skew.
- SimHash / quality / lang-id / winnowing: per-row array expressions
  inside codegen — embarrassingly parallel, zero or one shuffle.
- IVF: centroid table is tiny (≤ #labels) and broadcast; the probe
  prunes the scan to one centroid's partition — the brute-force
  cosine stays as the verification baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---- shared constants (mirrored into the SQL oracles) -------------------

MINHASH_P = 4294967311  # prime > 2^32
# 16 deterministic (a, b) permutation constants, a odd, < 2^30
MINHASH_AB = [
    (440509163, 896051669), (467929741, 552527933), (8189219, 405138723),
    (796359387, 18346013), (324221089, 973667265), (830083271, 551247907),
    (541294541, 281924893), (984037783, 910706683), (117884623, 704103097),
    (537069337, 289685891), (889009747, 30604823), (973446971, 838879457),
    (18261169, 784672041), (102476465, 90547543), (232439753, 276466967),
    (809747, 47469283),
]
MINHASH_PERMS = len(MINHASH_AB)
MINHASH_BAND_ROWS = 4
SIMHASH_BITS = 32
WINNOW_K = 5  # tokens per k-gram
WINNOW_W = 4  # k-grams per window

LANG_LEX = {
    "de": "der die und das von zu mit den auf ist".split(),
    "en": "the and of to in is for with on as".split(),
    "es": "el la de que y en un por con los".split(),
    "fr": "le ls et les des en un du que ou".split(),
}
STOPWORDS_10 = LANG_LEX["en"]

TOKS = "filter(split(lower(text), ' '), x -> x <> '')"
# 32-bit md5-derived token/shingle hash — identical in Spark and DuckDB
H32 = "cast(conv(substr(md5({x}), 1, 8), 16, 10) as bigint)"


def _toks(df: DataFrame) -> DataFrame:
    return df.withColumn("toks", F.expr(TOKS))


# ---- dedup: MinHash + LSH ----------------------------------------------


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh15): min-hash over word 3-shingles."""
    sh = (
        _toks(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 3 THEN "
                    "transform(sequence(0, size(toks)-3), "
                    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
                    "ELSE array(concat_ws(' ', toks)) END"
                )
            ).alias("sh"),
        )
        .withColumn("x", F.expr(H32.format(x="sh")))
    )
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band → candidate pair + #matching
    minhashes (est. Jaccard = n_match / 16)."""
    n_bands = MINHASH_PERMS // MINHASH_BAND_ROWS
    bands = None
    for b in range(n_bands):
        cols = [f"mh{j}" for j in range(b * MINHASH_BAND_ROWS, (b + 1) * MINHASH_BAND_ROWS)]
        part = sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws("-", *[F.col(c).cast("string") for c in cols]).alias("sig"),
        )
        bands = part if bands is None else bands.unionByName(part)
    left = bands.select(F.col("doc_id").alias("a"), "band", "sig")
    right = bands.select(F.col("doc_id").alias("b"), "band", "sig")
    pairs = (
        left.join(right, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a"), *[F.col(f"mh{j}").alias(f"a{j}") for j in range(MINHASH_PERMS)])
    sb = sigs.select(F.col("doc_id").alias("b"), *[F.col(f"mh{j}").alias(f"b{j}") for j in range(MINHASH_PERMS)])
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(MINHASH_PERMS)
    )
    return (
        pairs.join(sa, "a").join(sb, "b")
        .select("a", "b", matches.cast("long").alias("n_match"))
    )


# ---- dedup: SimHash -----------------------------------------------------


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit tf-weighted SimHash fingerprint."""
    tf = (
        _toks(docs)
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("x", F.expr(H32.format(x="term")))
    )
    bits = tf.select(
        "doc_id",
        "tf",
        "x",
        F.explode(F.expr(f"sequence(0, {SIMHASH_BITS - 1})")).alias("j"),
    )
    contrib = bits.withColumn(
        "c", F.expr("CASE WHEN (shiftright(x, j) & 1) = 1 THEN tf ELSE -tf END")
    )
    per_bit = contrib.groupBy("doc_id", "j").agg(F.sum("c").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(1L, j) ELSE 0L END"))
        .cast("long")
        .alias("simhash")
    )


# ---- dedup: n-gram Jaccard ---------------------------------------------


def ngram_jaccard_consecutive(docs: DataFrame) -> DataFrame:
    """Char-trigram Jaccard for consecutive doc-id pairs (a, a+1) —
    the oracle-checkable core of near-dup scoring; candidate-pair
    generation at scale comes from LSH buckets (lsh_candidate_pairs)."""
    tri = docs.select(
        "doc_id",
        F.explode(
            F.expr("array_distinct(transform(sequence(1, greatest(length(text)-2, 1)), i -> substring(text, i, 3)))")
        ).alias("g"),
    )
    a = tri.select(F.col("doc_id").alias("a"), "g")
    b = tri.select((F.col("doc_id") - 1).alias("a"), F.col("g").alias("g2"))
    inter = a.join(b, (a["a"] == b["a"]) & (a["g"] == b["g2"])).groupBy(a["a"].alias("a")).agg(
        F.count(F.lit(1)).alias("n_inter")
    )
    sizes = tri.groupBy(F.col("doc_id").alias("a")).agg(F.count(F.lit(1)).alias("n"))
    sz_a = sizes.select("a", F.col("n").alias("na"))
    sz_b = sizes.select((F.col("a") - 1).alias("a"), F.col("n").alias("nb"))
    return (
        inter.join(sz_a, "a")
        .join(sz_b, "a")
        .select(
            "a",
            (F.col("a") + 1).alias("b"),
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4).alias(
                "jaccard"
            ),
        )
    )


# ---- similarity: embeddings --------------------------------------------


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def neardup_cosine_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Sign-LSH bucketing (signs of dims 0..5 → 64 buckets), then
    exact cosine within buckets; pairs above threshold.

    Scale: the self-join is per-bucket (quadratic only within a
    bucket); more hyperplanes → smaller buckets. Random-hyperplane
    LSH would replace the axis planes at scale; axes keep the oracle
    exactly reproducible.
    """
    with_b = emb.select(
        "vec_id",
        "embedding",
        F.expr(
            "concat_ws('', transform(slice(embedding, 1, 6), x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))"
        ).alias("bucket"),
    )
    a = with_b.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"), "bucket")
    b = with_b.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("c"))
        .filter(F.col("c") >= F.lit(threshold))
        .select("a", "b", F.round("c", 4).alias("cosine"))
    )


def ivf_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """IVF-style ANN: coarse centroids = per-`label` mean vectors;
    probe the nearest centroid, exact cosine within that cell.

    Scale: centroids are a broadcast-sized table; the probe prunes
    the scan to one cell (≈ 1/#labels of the data). Brute-force
    cosine over the same data is the recall baseline.
    """
    cent = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("sm"))
        .select("label", F.expr("transform(sm, s -> s.m)").alias("centroid"))
    )
    qv = emb.filter(F.col("vec_id") == query_vec_id).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    best = (
        cent.select("label", F.round(cosine(F.col("centroid"), qlit), 6).alias("c"))
        .orderBy(F.desc("c"), F.asc("label"))
        .limit(1)
    )
    probe_label = best.head()[0]
    return (
        emb.filter(F.col("label") == probe_label)
        .select("vec_id", F.round(cosine(F.col("embedding"), qlit), 6).alias("c"))
        .orderBy(F.desc(F.round("c", 6)), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("c", 4).alias("cosine"))
    )


# ---- text analysis ------------------------------------------------------


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-lexicon language ID (n-gram-free heuristic): count
    hits per language's 10-word lexicon, argmax (ties → lang asc,
    all-zero → 'und')."""
    df = _toks(docs)
    scores = []
    for lang, lex in sorted(LANG_LEX.items()):
        inlist = ", ".join(f"'{w}'" for w in lex)
        scores.append(
            F.expr(f"size(filter(toks, x -> x IN ({inlist})))").alias(f"s_{lang}")
        )
    df = df.select("doc_id", *scores)
    langs = sorted(LANG_LEX)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when((best > 0) & (F.col(f"s_{lang}") == best), lang).otherwise(pred)
    return df.select("doc_id", pred.alias("pred_lang"), best.cast("long").alias("best_score"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/stopword/digit heuristics → one quality scalar."""
    stop = ", ".join(f"'{w}'" for w in STOPWORDS_10)
    df = _toks(docs).select(
        "doc_id",
        F.expr("size(toks)").cast("long").alias("n_toks"),
        F.expr(f"size(filter(toks, x -> x IN ({stop})))").cast("long").alias("n_stop"),
        F.length("text").cast("long").alias("n_chars"),
        (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", "")))
        .cast("long")
        .alias("n_digit"),
    )
    # quality = 0.4·stop_ratio + 0.3·min(avg_tok_len/10, 1) + 0.3·(1 − digit_ratio)
    # computed as an EXACT integer rational rounded to 4 decimals —
    # ((20000·num + den) div (2·den)) / 1e4 — so a cross-engine fp ulp
    # can never flip the rounding at a .00005 boundary.
    num = (
        "(40 * n_stop * n_chars"
        " + 3 * least(n_chars - n_toks + 1, 10 * n_toks) * n_chars"
        " + 30 * (n_chars - n_digit) * n_toks)"
    )
    den = "(100 * n_toks * n_chars)"
    return df.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        (F.expr("(20000 * n_stop + n_toks) div (2 * n_toks)") / F.lit(10000.0)).alias("stop_ratio"),
        (F.expr(f"(20000 * {num} + {den}) div (2 * {den})") / F.lit(10000.0)).alias("quality"),
    )


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every K-token gram, take the min of each W-length window,
    dedupe → fingerprint set. All inside codegen (array exprs)."""
    k, w = WINNOW_K, WINNOW_W
    grams = (
        f"transform(sequence(0, size(toks)-{k}), "
        f"i -> {H32.format(x=f'''concat_ws(' ', slice(toks, i+1, {k}))''')})"
    )
    expr = (
        f"CASE WHEN size(toks) >= {k + w - 1} THEN "
        f"array_distinct(transform(sequence(0, size(toks)-{k}-{w - 1}), "
        f"j -> array_min(slice(gs, j+1, {w})))) "
        f"WHEN size(toks) >= {k} THEN array(array_min(gs)) "
        f"ELSE array() END"
    )
    return (
        _toks(docs)
        .withColumn("gs", F.expr(grams))
        .withColumn("fps", F.expr(expr))
        .select(
            "doc_id",
            F.size("fps").cast("long").alias("n_fp"),
            F.expr("array_min(fps)").cast("long").alias("min_fp"),
        )
    )


# ---- multimodal plumbing ------------------------------------------------


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """Opaque-binary plumbing: treat the utf-8 bytes of `text` as a
    blob column with typed metadata (the schema/partitioning pattern
    for image/audio payloads; see multimodal_decode for the stub UDF
    path)."""
    blob = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha"),
        F.substring("text", 1, 12).alias("head"),
    )


def multimodal_decode(docs: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage over binary payloads.

    Real image/audio decoding libraries are unavailable in this
    container, so the decode is STUBBED: ``fake=True`` emits a
    deterministic byte-derived feature (every-Nth-byte sample), and
    ``fake=False`` raises NotImplementedError where a PIL/ffmpeg call
    would go. The Spark-side plumbing — binary column in Arrow
    batches, schema, partition-preserving mapInPandas — is real.
    """
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode needs an image/audio codec library; "
                    "wire PIL/torchaudio here outside the sandbox"
                )
            blobs = [t.encode("utf-8") for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in blobs],
                    "frame_sample": [b[::max(1, len(b) // 8)][:8].hex() for b in blobs],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        decode, "doc_id long, n_bytes long, frame_sample string"
    )

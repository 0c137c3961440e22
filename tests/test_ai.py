"""zulia-ai analogue: embeddings, sparse encoding, feature scaling,
binary classifier training + stats.

Mirrors the reference's test contracts — SparseEncoderModelTest
(positive weights, descending, maxTerms cap, batch),
TextEmbeddingModelTest (vector per text, batch, determinism),
BinaryClassifierStats.java confusion math and the scaler formulas in
MinMaxFeatureScaler.java / PercentileClippingFeatureScaler.java —
with the deterministic Spark-first "models" of zuliasearch_spark.ai
(no ONNX runtime in this environment; documented deviation).
"""

import math

import pytest
from pyspark.sql import functions as F

from zuliasearch_spark import ai


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "lung cancer immunotherapy"),
        (1, "breast cancer"),
        (2, "heart disease"),
        (3, "lung cancer immunotherapy treatment options and clinical trial results"),
        (4, "the the the and and of"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_text_embed_normalized_and_deterministic(texts):
    out = ai.text_embed(texts, dim=32).select("doc_id", "embedding").collect()
    by_id = {r["doc_id"]: r["embedding"] for r in out}
    for did, vec in by_id.items():
        assert len(vec) == 32
        n = math.sqrt(sum(x * x for x in vec))
        if did == 5:
            assert n == 0.0  # empty text → zero vector, not NaN
        else:
            assert n == pytest.approx(1.0, abs=1e-9)
    again = {
        r["doc_id"]: r["embedding"]
        for r in ai.text_embed(texts, dim=32).select("doc_id", "embedding").collect()
    }
    assert again == by_id  # TextEmbeddingModelTest determinism


def test_text_embed_similarity_orders_sensibly(texts):
    emb = {
        r["doc_id"]: r["embedding"]
        for r in ai.text_embed(texts, dim=64).select("doc_id", "embedding").collect()
    }

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    # doc 3 shares 3 tokens with doc 0, doc 2 shares none
    assert cos(emb[0], emb[3]) > cos(emb[0], emb[2])


def test_sparse_encode_contract(texts):
    out = ai.sparse_encode(texts, max_terms=3).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r)
    # maxTerms cap (SparseEncoderModelTest.testMaxTermsCapped)
    assert all(len(v) <= 3 for v in by_id.values())
    for rows in by_id.values():
        rows.sort(key=lambda r: r["rank"])
        weights = [r["weight"] for r in rows]
        # positive, descending (testEncode / testWeightsDescending)
        assert all(w > 0 for w in weights)
        assert weights == sorted(weights, reverse=True)
    # batch encode: every non-empty text gets rows
    assert set(by_id) == {0, 1, 2, 3, 4}
    # idf: a rarer term outweighs a stopword-ish repeated one
    d4 = {r["term"]: r["weight"] for r in by_id[4]}
    assert "the" in d4


def test_feature_stats_and_minmax_scaler(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    st = ai.feature_stats(df, ("x",))
    assert st["x"]["min"] == 0.0 and st["x"]["max"] == 100.0
    assert st["x"]["p50"] == pytest.approx(50.0)
    scaled = ai.scale_features(df, st, scaler="MinMax").agg(
        F.min("x"), F.max("x"), F.avg("x")
    ).collect()[0]
    assert scaled[0] == 0.0 and scaled[1] == 1.0
    assert scaled[2] == pytest.approx(0.5)


def test_percentile_clipping_scaler(spark):
    # one far outlier: percentile range centers, clip bounds it at ±3
    vals = [float(i) for i in range(100)] + [10_000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    st = ai.feature_stats(df, ("x",))
    got = ai.scale_features(
        df, st, scaler="PercentileClipping", normalize_range="P25_TO_P75", clip=3.0
    )
    mx = got.agg(F.max("x")).collect()[0][0]
    assert mx == 3.0  # clipped exactly (PercentileClippingFeatureScaler clip)
    # formula spot check on v=0
    lo = got.agg(F.min("x")).collect()[0][0]
    expect = max(-3.0, (0.0 - st["x"]["avg"]) / (st["x"]["p75"] - st["x"]["p25"]))
    assert lo == pytest.approx(expect, rel=1e-9)


def test_classifier_stats_math(spark):
    # hand-built confusion: tp=2 fp=1 tn=3 fn=1 at threshold 0.5
    rows = [
        (0.9, True), (0.7, True), (0.4, True),       # tp, tp, fn
        (0.6, False), (0.2, False), (0.1, False), (0.3, False),  # fp, tn, tn, tn
    ]
    df = spark.createDataFrame(rows, "p1 double, label boolean")
    s = ai.classifier_stats(df, "p1", "label", threshold=0.5)
    assert (s["truePositive"], s["falsePositive"], s["trueNegative"], s["falseNegative"]) == (2, 1, 3, 1)
    assert s["precision"] == pytest.approx(2 / 3)
    assert s["recall"] == pytest.approx(2 / 3)
    assert s["f1"] == pytest.approx(2 / 3)
    assert s["accuracy"] == pytest.approx(5 / 7)


def test_train_binary_classifier_separable(spark):
    # linearly separable synthetic data → near-perfect validate F1
    import numpy as np

    rng = np.random.RandomState(7)
    n = 400
    x0 = rng.normal(-2.0, 0.7, size=(n, 2))
    x1 = rng.normal(2.0, 0.7, size=(n, 2))
    rows = [(float(a), float(b), 0) for a, b in x0] + [
        (float(a), float(b), 1) for a, b in x1
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, label int")
    train, test = df.randomSplit([0.8, 0.2], seed=11)
    stats = ai.feature_stats(train, ("f1", "f2"))
    train_s = ai.scale_features(train, stats, scaler="MinMax")
    test_s = ai.scale_features(test, stats, scaler="MinMax")
    _model, predict = ai.train_binary_classifier(train_s, ("f1", "f2"), "label")
    s = ai.classifier_stats(predict(test_s), "p1", "label", threshold=0.5)
    assert s["f1"] >= 0.95
    assert s["accuracy"] >= 0.95

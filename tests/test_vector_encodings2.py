"""INT7 and BBQ_2BIT vector encodings (zulia_index.proto
VectorIndexingConfig.Encoding:255-262 — SEVEN_BIT and
DIBIT_QUERY_NIBBLE; Lucene 104's seven-bit scalar and two-bit binary
quantization paths). Both follow the engine's oversample+rescore
contract: the compact columns rank a candidate pool, the pool
rescored at full precision.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig, VectorConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine

DIM = 32
N = 400


def _vectors():
    rng = np.random.RandomState(7)
    x = rng.normal(0.0, 1.0, (N, DIM))
    # mildly clustered: 8 planted directions plus noise
    for i in range(N):
        x[i, i % 8] += 3.0
    return x


def _engine(spark, x, encoding, **vk):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "uid": [f"v{i:04d}" for i in range(len(x))],
                "tag": ["t"] * len(x),
                "emb": [row.tolist() for row in x],
            }
        )
    )
    cfg = IndexConfig(
        index_name=f"enc_{encoding.lower()}",
        unique_id_col="uid",
        number_of_shards=2,
        default_search_fields=("tag",),
        field_configs=(
            FieldConfig("tag", index_as=(IndexAs("tag", "lcKeyword"),)),
            FieldConfig("emb", vector_as=(VectorConfig("emb", encoding=encoding, **vk),)),
        ),
        store_positions=False,
    )
    return SearchEngine(build_index(df, cfg, stored_cols=("emb",)).persist())


def _recall(eng, x, queries, k=10):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    total = 0.0
    for q in queries:
        sims = xn @ xn[q]
        true = set(np.argsort(-np.round(sims, 12), kind="stable")[:k].tolist())
        got = {int(r["uniqueId"][1:]) for r in eng._knn_top_rows(x[q].tolist(), "emb", k)}
        total += len(true & got) / k
    return total / len(queries)


QUERIES = (0, 13, 77, 150, 288, 399)


@pytest.fixture(scope="module")
def corpus():
    return _vectors()


def test_int7_recall_and_clip(spark, corpus):
    eng = _engine(spark, corpus, "INT7")
    assert _recall(eng, corpus, QUERIES) >= 0.9
    mx = eng.tables.doc_map.select(
        F.max(
            F.aggregate("_zvq_emb", F.lit(0), lambda a, v: F.greatest(a, F.abs(v.cast("int"))))
        ).alias("m")
    ).head()["m"]
    assert mx <= 63  # SEVEN_BIT: top bit free, codes clip at ±63


def test_int7_quantile_scales_per_shard(spark, corpus):
    eng = _engine(spark, corpus, "INT7", calibration="QUANTILE")
    pairs = eng.tables.doc_map.select("shard", "_zvs_emb").distinct().collect()
    assert len(pairs) == 2


def test_bbq2_recall_beats_bbq_first_pass(spark, corpus):
    """2-bit codes carry magnitude the 1-bit sign encoding lacks: at
    oversample=1.0 (no rescore slack) the 2-bit first pass must not
    rank worse than the 1-bit one."""
    b2 = _engine(spark, corpus, "BBQ_2BIT", oversample=1.0)
    b1 = _engine(spark, corpus, "BBQ", oversample=1.0)
    r2 = _recall(b2, corpus, QUERIES)
    r1 = _recall(b1, corpus, QUERIES)
    assert r2 >= r1, (r2, r1)


def test_bbq2_recall_with_rescore(spark, corpus):
    eng = _engine(spark, corpus, "BBQ_2BIT")  # default oversample 3.0
    assert _recall(eng, corpus, QUERIES) >= 0.8


def test_bbq2_storage_shape(spark, corpus):
    """Two packed bit-planes (64 dims per long), a per-vector scale,
    and the dequantized norm — no full-precision duplicate columns."""
    eng = _engine(spark, corpus, "BBQ_2BIT")
    cols = eng.tables.doc_map.columns
    assert {"_zvq_emb", "_zvqh_emb", "_zvs_emb", "_zvn_emb"} <= set(cols)
    row = eng.tables.doc_map.select("_zvq_emb", "_zvqh_emb", "_zvs_emb", "_zvn_emb").head()
    assert len(row["_zvq_emb"]) == (DIM + 63) // 64
    assert len(row["_zvqh_emb"]) == (DIM + 63) // 64
    assert row["_zvs_emb"] > 0 and row["_zvn_emb"] > 0


def test_bbq2_codes_roundtrip_exactly(spark, corpus):
    """Driver-side replica of the 2-bit encode: unpacking the planes
    must reproduce clamp(round(x/s + 1.5), 0, 3) bit-for-bit."""
    eng = _engine(spark, corpus, "BBQ_2BIT")
    rows = eng.tables.doc_map.select("uniqueId", "emb", "_zvq_emb", "_zvqh_emb", "_zvs_emb").collect()
    for r in rows[:25]:
        v = np.asarray(r["emb"], dtype=np.float64)
        s = float(r["_zvs_emb"])
        want = np.clip(np.round(v / s + 1.5), 0, 3).astype(int)
        got = []
        for w0, w1 in zip(r["_zvq_emb"], r["_zvqh_emb"]):
            chunk = min(64, DIM - len(got))
            for j in range(chunk):
                b0 = (w0 >> (chunk - 1 - j)) & 1
                b1 = (w1 >> (chunk - 1 - j)) & 1
                got.append(2 * b1 + b0)
        assert got == want.tolist(), r["uniqueId"]

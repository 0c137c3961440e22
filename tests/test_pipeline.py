"""Pipeline-op invariants on small deterministic frames.

Cross-engine value parity vs DuckDB is covered by the driver gate
(zuliasearch_spark.gate + scripts/driver_sim.py); these tests pin the
algorithmic invariants: duplicates collide, near-dups score high,
disjoint texts score low, fingerprints are stable.
"""

import pytest

from zuliasearch_spark import pipeline as P


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base, "en", "s0", len(base)),
        (1, base, "en", "s0", len(base)),  # exact dup of 0
        (2, base.replace("today", "tomorrow"), "en", "s0", 1),  # near-dup
        (3, "el perro y el gato en la casa de los vecinos", "es", "s1", 1),
        (4, "der hund und die katze mit den kindern auf der wiese ist da", "de", "s1", 1),
        (5, "completely different words about spark query engines and indexes", "en", "s2", 1),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_minhash_dups_collide(docs):
    sigs = P.minhash_signatures(docs)
    pairs = {(r["a"], r["b"]): r["n_match"] for r in P.lsh_candidate_pairs(sigs).collect()}
    assert pairs[(0, 1)] == P.MINHASH_PERMS  # identical docs: all 16 match
    near = pairs.get((0, 2), 0)
    assert near >= P.MINHASH_BAND_ROWS  # near-dup shares at least a band
    assert (0, 5) not in pairs and (3, 4) not in pairs


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_simhash_dups_equal(docs):
    fp = {r["doc_id"]: r["simhash"] for r in P.simhash(docs).collect()}
    assert fp[0] == fp[1]
    assert _ham(fp[0], fp[2]) < _ham(fp[0], fp[5])  # near-dup closer


def test_simhash_pairs_complete_under_budget(spark):
    """Contract: EVERY pair within the Hamming budget is returned —
    the derived max_hamming+1 bands make pigeonhole cover the full
    budget (the old fixed 4×8-bit layout guaranteed only ≤3 while
    filtering at ≤6)."""
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    base = list(rng.choice(vocab, size=30))
    for i in range(40):
        doc = list(base)
        # perturb a few tokens so fingerprints cluster at small
        # Hamming distances
        for _ in range(int(rng.integers(0, 4))):
            doc[int(rng.integers(0, len(doc)))] = vocab[int(rng.integers(0, len(vocab)))]
        rows.append((i, " ".join(doc)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for budget in (2, 6):
        fp = {r["doc_id"]: r["simhash"] for r in P.simhash(docs).collect()}
        want = {
            (a, b)
            for a in fp
            for b in fp
            if a < b and _ham(fp[a], fp[b]) <= budget
        }
        got = {
            (r["a"], r["b"])
            for r in P.simhash_pairs(docs, max_hamming=budget).collect()
        }
        assert got == want, f"budget {budget}: missing {want - got}, extra {got - want}"


def test_ngram_jaccard(docs):
    j = {r["a"]: r["jaccard"] for r in P.ngram_jaccard_consecutive(docs).collect()}
    assert j[0] == 1.0  # identical consecutive docs
    assert j.get(1, 0) > 0.7  # near-dup
    assert j.get(4, 1.0) < 0.3  # unrelated


def test_lang_id(docs):
    pred = {r["doc_id"]: r["pred_lang"] for r in P.lang_id(docs).collect()}
    assert pred[0] == "en" and pred[3] == "es" and pred[4] == "de"


def test_quality_monotone_in_stopwords(docs):
    q = {r["doc_id"]: r for r in P.quality_score(docs).collect()}
    assert q[0]["stop_ratio"] > q[5]["stop_ratio"]
    assert 0.0 <= q[0]["quality"] <= 1.0


def test_winnow_stable_and_dup_equal(docs):
    fp = {r["doc_id"]: (r["n_fp"], r["min_fp"]) for r in P.winnow_fingerprints(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0][0] >= 1


def test_multimodal_stub(docs):
    meta = {r["doc_id"]: r for r in P.multimodal_meta(docs).collect()}
    assert meta[0]["n_bytes"] == meta[1]["n_bytes"] > 0
    dec = {r["doc_id"]: r for r in P.multimodal_decode(docs).collect()}
    assert dec[0]["frame_sample"] == dec[1]["frame_sample"]
    assert dec[0]["n_bytes"] == meta[0]["n_bytes"]
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        P.multimodal_decode(docs, fake=False).collect()


def test_ivf_matches_brute_force(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # 3 well-separated clusters so IVF probe-1 has perfect recall
    centers = rng.normal(0, 1, (3, 16)) * 10
    rows = []
    for i in range(90):
        lab = i % 3
        v = centers[lab] + rng.normal(0, 0.1, 16)
        rows.append((i, [float(x) for x in v], lab))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    ivf = [(r["vec_id"], r["cosine"]) for r in P.ivf_topk(emb, query_vec_id=0, k=5).collect()]
    # brute force over all vectors
    from pyspark.sql import functions as F

    qv = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    bf = (
        emb.select("vec_id", F.round(P.cosine(F.col("embedding"), qlit), 6).alias("c"))
        .orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert [r["vec_id"] for r in bf] == [v for v, _ in ivf]

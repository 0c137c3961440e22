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


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (0, "mail me at bob@example.com or jo.doe+x@sub.ex.org thanks"),
        (1, "call 555-123-4567 ssn 123-45-6789 host 10.0.0.1 ok"),
        (2, "nothing sensitive here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.pii_scrub(docs).collect()}
    assert out[0]["n_email"] == 2 and out[0]["n_redacted"] == 2
    assert out[1]["n_phone"] == 1 and out[1]["n_ssn"] == 1 and out[1]["n_ipv4"] == 1
    assert out[2]["n_redacted"] == 0
    # redacted text never re-matches any PII pattern
    import re

    clean = "call [PII] ssn [PII] host [PII] ok"
    import hashlib

    assert out[1]["clean_sha"] == hashlib.sha256(clean.encode()).hexdigest()
    for _name, pat in P.PII_PATTERNS:
        assert not re.search(pat, clean)


def test_url_stats_domains(spark):
    rows = [
        (0, "see https://a.org/x and http://a.org/y and https://b.net/z"),
        (1, "no links"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.url_stats(docs).collect()}
    assert out[0]["n_urls"] == 3 and out[0]["n_domains"] == 2
    assert out[0]["domains"] == "a.org,b.net"
    assert out[1]["n_urls"] == 0 and out[1]["domains"] == ""


def test_repetition_stats(spark):
    rows = [
        (0, "a a a a"),                    # one type, all dup 2-grams
        (1, "w x y z"),                    # all distinct
        (2, "solo"),                       # single token: no 2-grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.repetition_stats(docs).collect()}
    assert out[0]["type_token_ratio"] == 0.25 and out[0]["top_tok_frac"] == 1.0
    assert out[0]["dup_2gram_frac"] == round((3 - 1) / 3, 4)
    assert out[1]["type_token_ratio"] == 1.0 and out[1]["dup_2gram_frac"] == 0.0
    assert out[2]["n_toks"] == 1 and out[2]["dup_2gram_frac"] == 0.0


def test_contamination(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon"),   # contains bench gram
        (1, "zeta eta theta iota kappa"),        # disjoint
        (2, "alpha beta gamma"),                 # exactly the bench doc text
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(99, "alpha beta gamma")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.contamination(train, bench).collect()}
    assert out[0]["n_grams"] == 3 and out[0]["n_contaminated"] == 1
    assert out[1]["n_contaminated"] == 0
    assert out[2]["n_contaminated"] == 1 and out[2]["contaminated_frac"] == 1.0
    flagged = P.contamination(train, bench, min_frac=0.5).collect()
    assert [r["doc_id"] for r in flagged] == [2]


def test_pack_sequences(spark):
    # one group so the running offsets are easy to pin
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([100, 100, 100, 60])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.pack_sequences(docs, budget=256, n_groups=1).collect()}
    assert [out[i]["bin_id"] for i in range(4)] == [0, 0, 0, 1]
    assert [out[i]["bin_offset"] for i in range(4)] == [0, 100, 200, 44]


def test_stratified_sample_deterministic(spark):
    rows = [(i, f"doc {i}", "en" if i % 2 == 0 else "xx") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = P.stratified_sample(docs).filter("_sample_keep").collect()
    b = P.stratified_sample(docs).filter("_sample_keep").collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    rep = {r["lang"]: r for r in P.stratified_sample_report(docs).collect()}
    # en keeps ~50% (5000 bp), unknown stratum falls back to ~10%
    assert 0.3 <= rep["en"]["kept_frac"] <= 0.7
    assert rep["xx"]["kept_frac"] <= 0.25
    assert rep["en"]["n_total"] == 100 and rep["xx"]["n_total"] == 100


def test_lsh_tuning_bounds_false_negatives():
    """VERDICT r4 #10: banding must be config-driven with the S-curve
    P(candidate|s) = 1 − (1 − s^r)^b documented and the chosen (r, b)
    bounding the false-negative rate at the dedup threshold."""
    # at 16 perms the bound forces SHALLOW bands (r=2): recall holds
    # but the S-curve is mushy — sub-threshold pairs flood the
    # verify stage. 128 perms affords r=8 at the same bound: the
    # candidate rate at s=0.5 drops by orders of magnitude.
    r16, b16 = P.lsh_tuning(0.8, 16)
    r128, b128 = P.lsh_tuning(0.8, 128)
    assert r16 * b16 == 16 and r128 * b128 == 128
    assert P.lsh_false_negative_rate(0.8, 16, r16) <= 0.05
    assert P.lsh_false_negative_rate(0.8, 128, r128) <= 0.05
    assert r128 > r16  # sharper curve with more perms

    def candidate_rate(s, n, r):
        return 1.0 - P.lsh_false_negative_rate(s, n, r)

    # the sharpness payoff: at a 10%-miss budget, 128 perms afford
    # 8-row bands whose sub-threshold candidate rate collapses, while
    # 16 perms cap at r=2 and flood the verify stage
    r128_10, _ = P.lsh_tuning(0.8, 128, max_fn_rate=0.1)
    r16_10, _ = P.lsh_tuning(0.8, 16, max_fn_rate=0.1)
    assert candidate_rate(0.5, 128, r128_10) < 0.1 < candidate_rate(0.5, 16, r16_10)
    # an unmeetable contract fails loud instead of silently missing
    with pytest.raises(ValueError, match="raise n_perms"):
        P.lsh_tuning(0.5, 4, max_fn_rate=1e-9)


def test_minhash_perm_constants_deterministic_and_extended():
    a = P.minhash_perm_constants(16)
    assert a == P.MINHASH_AB  # frozen oracle constants unchanged
    c = P.minhash_perm_constants(64)
    assert c[:16] == P.MINHASH_AB
    assert len(set(c)) == 64
    assert all(x % 2 == 1 and 0 < x < (1 << 30) for x, _ in c[16:])
    assert c == P.minhash_perm_constants(64)  # reproducible


def test_configurable_signature_width_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different text about spark engines here")],
        "doc_id long, text string",
    )
    sigs = P.minhash_signatures(docs, n_perms=32)
    assert sum(1 for cname in sigs.columns if cname.startswith("mh")) == 32
    pairs = {(r["a"], r["b"]) for r in P.lsh_candidate_pairs(sigs, band_rows=2).collect()}
    assert (1, 2) in pairs
    got = P.lsh_candidate_pairs(sigs, band_rows=2).filter("a = 1 and b = 2").head()
    assert got["n_match"] > 16  # near-dup pair matches most of 32 perms

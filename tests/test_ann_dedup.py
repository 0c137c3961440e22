"""ANN (trained IVF) + dedup pair-generation operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from zuliasearch_spark import pipeline as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def _brute(emb_np, ids, q, k=10):
    qn = q / np.linalg.norm(q)
    cos = emb_np @ qn
    return ids[np.argsort(-cos, kind="stable")[:k]]


def test_ivf_recall_and_scan_fraction(emb):
    """Trained IVF at nprobe=4/8 must beat the random-scan recall
    baseline by a wide margin and stay exact for the gate config.

    The synthetic embeddings are near-uniform on the sphere — the
    worst case for any cell-based ANN — so mean recall ~0.8 at a 50%
    scan is the honest ceiling (a random half-scan would give 0.5)."""
    cent = P.kmeans_centroids(emb, n_cells=8)
    assert cent.shape == (8, 64)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cells = np.argmax(Xn @ cent.T, axis=1)
    # scan fraction at nprobe=4 is bounded near 1/2
    sizes = np.bincount(cells, minlength=8)
    assert sizes.max() < len(ids) * 0.35  # no degenerate mega-cell
    recalls = []
    for q in range(20):
        qv = X[ids == q][0]
        qn = qv / np.linalg.norm(qv)
        probe = set(np.argsort(-(cent @ qn), kind="stable")[:4].tolist())
        true = _brute(Xn, ids, qv, 10)
        got = P.ivf_topk(emb, query_vec_id=q, n_cells=8, nprobe=4, centroids=cent).collect()
        got_ids = {r["vec_id"] for r in got}
        recalls.append(len(got_ids & set(true.tolist())) / 10)
        # sanity: every returned id is in a probed cell
        for r in got:
            assert cells[ids == r["vec_id"]][0] in probe
    assert np.mean(recalls) >= 0.7  # >> random-scan baseline of 0.5


def test_ivf_gate_config_exact(emb):
    """The gate configuration (query 30, nprobe 5) is rank-identical
    to brute force — recall@10 = 1.0."""
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    true = _brute(Xn, ids, X[ids == 30][0], 10)
    got = [r["vec_id"] for r in P.ivf_topk(emb, query_vec_id=30, n_cells=8, nprobe=5).collect()]
    assert set(got) == set(true.tolist())


def test_simhash_pairs_candidates_complete(docs):
    """Banding guarantee: EVERY pair within Hamming ≤ 3 (= bands−1)
    shares a band, so simhash_pairs at max_hamming=3 finds exactly
    the brute-force set; at larger radii it returns a subset with
    exact distances."""
    fps = {r["doc_id"]: r["simhash"] for r in P.simhash(docs).collect()}
    items = sorted(fps.items())
    brute3 = {
        (a, b)
        for i, (a, fa) in enumerate(items)
        for b, fb in items[i + 1 :]
        if bin(fa ^ fb).count("1") <= 3
    }
    got = {(r["a"], r["b"]): r["hamming"] for r in P.simhash_pairs(docs, max_hamming=3).collect()}
    assert set(got) == brute3
    for (a, b), h in got.items():
        assert h == bin(fps[a] ^ fps[b]).count("1")


def test_jaccard_pairs_exact(spark, docs):
    """jaccard_pairs scores arbitrary candidate pairs exactly."""
    pairs = spark.createDataFrame([(0, 1), (2, 3), (10, 250)], "a long, b long")
    got = {(r["a"], r["b"]): r["jaccard"] for r in P.jaccard_pairs(docs, pairs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.filter(F.col("doc_id") < 300).collect()}

    def sh(t):
        toks = [x for x in t.lower().split() if x]
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    for (a, b), j in got.items():
        sa, sb = sh(texts[a]), sh(texts[b])
        expect = round(len(sa & sb) / len(sa | sb), 4)
        assert j == pytest.approx(expect, abs=1e-4)


def test_neardup_hyperplanes_scale_path(emb):
    """Random-hyperplane buckets: precision stays exact (cosine
    verified), recall tracked against the fixed-axis baseline."""
    fixed = {(r["a"], r["b"]) for r in P.neardup_cosine_pairs(emb, threshold=0.4).collect()}
    planes = {(r["a"], r["b"]) for r in P.neardup_cosine_pairs(emb, threshold=0.4, n_planes=6).collect()}
    # both are subsets of the true pair set; verify against brute force
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    true = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(round(cos[i, j], 6), 4) >= 0.4 and round(cos[i, j], 6) >= 0.4
    }
    assert planes <= true and fixed <= true  # exact precision
    assert len(planes) > 0
    # 6 pseudo-random planes should find a comparable share to 6 axes
    assert len(planes) >= len(fixed) * 0.5


def test_hyperplanes_deterministic():
    a = P.hyperplanes(4, 64)
    b = P.hyperplanes(4, 64)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_neardup_auto_planes_bounded_occupancy(spark):
    """Default near-dup bucketing auto-derives n_planes from a count
    (max(6, ceil(log2 n))), keeping expected bucket occupancy O(1) as
    the corpus grows — with the old fixed 64-bucket layout mean
    occupancy is n/64 and the self-join grows quadratically."""
    import math
    from collections import Counter

    import numpy as np

    from zuliasearch_spark import pipeline as P

    dims = 8
    for n in (256, 2048):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(n, dims))
        n_planes = max(6, math.ceil(math.log2(n)))
        h = P.hyperplanes(n_planes, dims)
        sig = (x @ h.T >= 0)
        occ = Counter(map(tuple, sig.tolist()))
        mean_occ = n / len(occ)
        assert mean_occ <= 4.0, f"n={n}: mean occupancy {mean_occ:.1f}"
        assert max(occ.values()) <= 48, f"n={n}: max occupancy {max(occ.values())}"

    # the DataFrame path actually uses the derived planes and stays
    # exact-precision: every returned pair clears the threshold
    rows = [(i, [float(v) for v in np.random.default_rng(i).normal(size=dims)]) for i in range(64)]
    rows.append((64, rows[0][1]))  # exact dup pair (0, 64)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = P.neardup_cosine_pairs(emb, threshold=0.9).collect()
    assert all(r["cosine"] >= 0.9 for r in got)
    assert (0, 64) in {(r["a"], r["b"]) for r in got}


def test_simhash_block_combos_complete_and_wide():
    """Manku blocking invariants: (1) COMPLETENESS — for every way of
    flipping ≤ h bits, some table's combination avoids all flipped
    blocks; (2) WIDTH — the default h=6 layout keys on 16-bit block
    pairs (65,536 bucket values/table), replacing r4's ≤10-bit single
    bands whose ≤1024 values/band made buckets quadratic at corpus
    scale."""
    import itertools

    for h, blocks in ((6, None), (3, None), (6, 10), (1, 4), (0, 2)):
        layout, combos = P.simhash_block_combos(h, blocks)
        nb = len(layout)
        assert sum(w for _, w in layout) == 64
        k = nb - h
        assert all(len(c) == k for c in combos)
        # flipping bits in any ≤h blocks leaves ≥1 combo untouched
        for flipped in itertools.combinations(range(nb), min(h, nb - k)):
            assert any(set(c).isdisjoint(flipped) for c in combos), (h, flipped)
    # default h=6: 28 tables, 16-bit keys
    layout, combos = P.simhash_block_combos(6)
    assert len(combos) == 28
    key_bits = min(
        sum(layout[b][1] for b in combo) for combo in combos
    )
    assert key_bits == 16


def test_simhash_pairs_results_scheme_independent(docs):
    """The exact hamming filter makes the RESULT invariant to the
    blocking scheme: default blocks vs a wider table set must return
    identical pair sets."""
    a = {(r["a"], r["b"], r["hamming"]) for r in P.simhash_pairs(docs, max_hamming=3).collect()}
    b = {
        (r["a"], r["b"], r["hamming"])
        for r in P.simhash_pairs(docs, max_hamming=3, blocks=6).collect()
    }
    assert a == b

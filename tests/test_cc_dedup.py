"""Connected-components clustering + end-to-end fuzzy-dedup keep flags.

Reference context: zulia dedups at the uniqueId level (upsert replace,
`zulia-server .../index/ZuliaShard.java` store path); content-level
near-dup CLUSTERING is a training-data-pipeline extension (SURVEY
§2.15). The CC algorithm is large-star/small-star (Kiveris et al.,
SoCC 2014); the oracle here is a plain Python union-find.
"""

import random

import pytest
from pyspark.sql import functions as F

import zuliasearch_spark.pipeline as P


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # component label = min node id in the component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "a: long, b: long")
    out = P.connected_components(df).collect()
    return {r["id"]: r["component"] for r in out}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    expect = _uf_components(nodes, edges)
    got = _cc_spark(spark, edges)
    assert got == expect


def test_cc_two_pairs_and_triangle(spark):
    _check(spark, [(1, 2), (10, 11), (20, 21), (21, 22), (20, 22)])


def test_cc_long_path_converges(spark):
    # worst case for star algorithms: a 33-node path (log^2 n rounds)
    _check(spark, [(i, i + 1) for i in range(100, 132)])


def test_cc_star_and_isolated_edge(spark):
    _check(spark, [(5, i) for i in range(6, 16)] + [(99, 98)])


def test_cc_duplicate_and_reversed_edges(spark):
    _check(spark, [(2, 1), (1, 2), (2, 1), (3, 2), (7, 8), (8, 7)])


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "a: long, b: long")
    assert P.connected_components(df).count() == 0


@pytest.mark.parametrize("seed", [7, 41])
def test_cc_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(45)]
    _check(spark, edges)


def test_dedup_clusters_groups_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    # cluster A: docs 0,1,2 near-identical (one trailing word differs)
    for i, tail in enumerate(["today", "tonight", "again"]):
        rows.append((i, base.rsplit(" ", 1)[0] + " " + tail))
    # cluster B: docs 10,11 identical
    txt_b = "pack my box with five dozen liquor jugs for the annual county fair parade"
    rows.append((10, txt_b))
    rows.append((11, txt_b))
    # unrelated singletons
    rows.append((20, "completely different content about spark physical plans and shuffles"))
    rows.append((21, "another unrelated document mentioning parquet row groups and page indexes"))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")

    out = {r["doc_id"]: (r["cluster"], r["keep"]) for r in P.dedup_clusters(docs, threshold=0.5).collect()}
    assert len(out) == 7
    # cluster A collapses to min id 0; only doc 0 kept
    assert out[0] == (0, True)
    assert out[1] == (0, False)
    assert out[2] == (0, False)
    # cluster B collapses to 10
    assert out[10] == (10, True)
    assert out[11] == (10, False)
    # singletons keep themselves
    assert out[20] == (20, True)
    assert out[21] == (21, True)
    # the deduplicated corpus is exactly one doc per cluster
    kept = [d for d, (_, k) in out.items() if k]
    assert sorted(kept) == [0, 10, 20, 21]


def test_dedup_clusters_high_threshold_splits(spark):
    # at threshold=1.0 only EXACT shingle sets cluster
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: r["cluster"] for r in P.dedup_clusters(docs, threshold=1.0).collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 3


def test_dedup_keep_best_prefers_quality(spark):
    # cluster of near-identical docs where the LATER doc has higher
    # quality (more stopwords) — keeper must be quality-best, not
    # min-id
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base + " xq zz"),                  # fewer stopwords at tail
        (2, base + " and the"),                # extra stopwords -> higher quality
        (9, "completely unrelated text about catalyst plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: (r["cluster"], r["keep"]) for r in
           P.dedup_keep_best(docs, threshold=0.5).collect()}
    assert out[1][0] == out[2][0] == 1          # same cluster, min-id label
    kept = [d for d, (_, k) in out.items() if k]
    assert 9 in kept and len(kept) == 2
    assert (1 in kept) != (2 in kept)           # exactly one of the pair


def test_dedup_clusters_tuned_signature(spark):
    """n_perms routes through lsh_tuning: a wider signature with the
    FN-bounded band shape finds the same near-dup clusters on a
    clean-cut corpus (default path stays the frozen 16/4 oracle
    shape)."""
    from zuliasearch_spark import pipeline as P

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu nu"),
            (2, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu xi"),
            (3, "totally different content about query engines"),
        ],
        "doc_id long, text string",
    )
    base = {(r["doc_id"], r["cluster"]) for r in P.dedup_clusters(docs).collect()}
    wide = {
        (r["doc_id"], r["cluster"])
        for r in P.dedup_clusters(docs, n_perms=64).collect()
    }
    assert base == wide
    assert (2, 1) in base and (3, 3) in base

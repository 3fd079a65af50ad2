"""Recall characterization of the LSH near-dup scale paths against the
brute-force ground truth (dd06) at sf0.01.

Sign-bucket LSH recall for a pair with angle θ is p^bits per table
with p = 1 − θ/π, and 1 − (1 − p^bits)^L over L tables — so the
multi-table variant must dominate the single-table one, and true
near-duplicates (high cosine) must be caught reliably. These are the
recall/cost knobs a 100 TB run tunes; this test pins the ladder so a
refactor can't silently destroy recall."""

import pytest

from grisp_spark.operators import similarity
from grisp_spark.sources.testdata import load_table


def _pairs(df):
    return {(r.va, r.vb) for r in df.select("va", "vb").collect()}


@pytest.fixture()
def emb(spark, sf_dir):
    # NOTE: fresh frame per operator, no .cache() — sharing/caching a
    # frame across several pandas-UDF self-joins trips a Catalyst
    # attribute rebinding bug (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    def fresh():
        return load_table(spark, sf_dir, "embeddings")

    return fresh


def test_lsh_recall_ladder(emb):
    truth = _pairs(similarity.neardup_pairs(emb(), threshold=0.4))
    single = _pairs(similarity.neardup_pairs_lsh(emb(), threshold=0.4))
    multi = _pairs(similarity.neardup_pairs_lsh_multi(emb(), threshold=0.4))
    # LSH candidates are a subset of the exact pair set (no false
    # positives possible: the verify step applies the same threshold)
    assert single <= truth
    assert multi <= truth
    # 4 tables × 6 bits dominates 1 table × 8 bits in expectation:
    # 1−(1−p^6)^4 vs p^8 — require it on this corpus too
    assert len(multi) >= len(single)


def test_ivf_multiprobe_recall_ladder(spark, sf_dir):
    """probe=2 must dominate probe=1 against exact top-k: every
    probe-1 hit is also probed at probe=2 (cells are nested), and the
    extra cell can only add true neighbors."""

    def fresh():
        return load_table(spark, sf_dir, "embeddings")

    def hits(df):
        return {(r.q_id, r.c_id) for r in df.select("q_id", "c_id").collect()}

    exact = hits(similarity.topk_bruteforce(fresh(), n_queries=5, k=5))
    p1 = hits(similarity.topk_ivf(fresh(), n_queries=5, k=5, probe=1))
    p2 = hits(similarity.topk_ivf(fresh(), n_queries=5, k=5, probe=2))
    assert len(p2 & exact) >= len(p1 & exact)
    # and multiprobe keeps the candidate discipline: k results per query
    assert len(p2) == len(p1) == len(exact)


def test_multi_table_recall_on_true_neardups(spark):
    """True near-dups (cos ≥ 0.9, θ ≤ 26°, p ≈ 0.86 per sign bit) must
    be found with high probability: expected recall 1−(1−0.86⁶)⁴ ≈ 0.87
    for L=4 tables × 6 bits. The testdata corpus has no cos≥0.9 pairs,
    so plant them: 100 base vectors + a perturbed copy of each
    (deterministic seed)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((100, 64)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # σ=0.04 per dim → noise norm ≈ 0.04·√64 = 0.32 → cos ≈ 0.95
    dup = base + 0.04 * rng.standard_normal((100, 64)).astype(np.float32)
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(100)] + [
        (100 + i, dup[i].tolist()) for i in range(100)
    ]

    def fresh():
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    truth = _pairs(similarity.neardup_pairs(fresh(), threshold=0.9))
    assert len(truth) >= 80, f"planting failed: only {len(truth)} true pairs"
    multi = _pairs(similarity.neardup_pairs_lsh_multi(fresh(), threshold=0.9))
    recall = len(multi & truth) / len(truth)
    assert recall >= 0.8, f"multi-table recall {recall:.2f} on {len(truth)} pairs"


def test_ivf_kmeans_centroids_recall(spark, sf_dir):
    """Trained spherical k-means centroids (VERDICT r4 #8) must be
    deterministic (the recall ladder stays pinned), keep the k-per-
    query output discipline on the real corpus, and — on a corpus
    with genuine cluster structure where the head-centroid stand-in
    is degenerate (the first n_cells vectors all sit in ONE cluster)
    — recover the true cells and beat its recall. On the uniform
    testdata embeddings centroid choice is luck of the cell
    boundaries, so the dominance claim is pinned on the planted
    corpus, not there."""
    import numpy as np

    from grisp_spark.sources.testdata import load_table

    def hits(df):
        return {(r.q_id, r.c_id) for r in df.select("q_id", "c_id").collect()}

    # determinism + discipline on the real corpus
    def fresh():
        return load_table(spark, sf_dir, "embeddings")

    exact = hits(similarity.topk_bruteforce(fresh(), n_queries=5, k=5))
    km1 = hits(
        similarity.topk_ivf(fresh(), n_queries=5, k=5, probe=2,
                            centroids="kmeans")
    )
    km2 = hits(
        similarity.topk_ivf(fresh(), n_queries=5, k=5, probe=2,
                            centroids="kmeans")
    )
    assert km1 == km2, "k-means centroid training must be deterministic"
    assert len(km1) == len(exact)  # k results per query discipline

    # planted 4-cluster corpus: ids 0-3 (the head centroids AND the
    # first 4 queries) all in cluster 0, rest interleaved — head cells
    # partition cluster 0's interior, so a cluster-0 query's true
    # neighbors scatter across head cells, while trained centroids
    # give each cluster one cell
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for i in range(400):
        c = 0 if i < 4 else i % 4
        v = centers[c] + 0.1 * rng.standard_normal(64)
        vecs.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))

    def planted():
        return spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>"
        )

    p_exact = hits(similarity.topk_bruteforce(planted(), n_queries=5, k=5))
    p_head = hits(similarity.topk_ivf(planted(), n_queries=5, k=5, probe=1))
    p_km = hits(
        similarity.topk_ivf(planted(), n_queries=5, k=5, probe=1,
                            centroids="kmeans")
    )
    head_recall = len(p_head & p_exact) / len(p_exact)
    km_recall = len(p_km & p_exact) / len(p_exact)
    assert km_recall > head_recall, (km_recall, head_recall)
    assert km_recall >= 0.9, km_recall


def test_kmeans_centroids_unit_and_deterministic(spark, sf_dir):
    from grisp_spark.sources.testdata import load_table
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    a = similarity.kmeans_centroids(emb, 4)
    b = similarity.kmeans_centroids(emb, 4)
    assert a == b
    assert [cid for cid, _ in a] == [0, 1, 2, 3]
    for _cid, vec in a:
        assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-9

"""Similarity search over embedding columns (array<float>).

Dot products run in an Arrow-batched pandas UDF that is vectorized
ACROSS rows but sequential (left-associated) ACROSS dimensions:
``acc = acc + a[:, i] * b[:, i]`` in float64. That makes the doubles
bit-identical to the DuckDB oracle's left-associated product chain —
rank tie-breaks can't flap between engines — while running at numpy
speed (a 64-term Catalyst expression chain is ~50 µs/row because the
generated method is too big to JIT; the batched UDF is ~100x faster).
Norms are precomputed once per row (not per pair).

Scale notes (100 TB / 10^9 vectors):
- brute-force top-k is the O(n·q) correctness baseline; the query set
  is broadcast against the corpus — no shuffle of the big side, one
  scan, then per-query top-k windows.
- the LSH path buckets vectors by the sign pattern of their leading
  components (axis-aligned hyperplane LSH); candidate generation is
  an equi-join on bucket — the n² space is never touched. Recall is
  tunable via bits / multi-probe.
- near-dup pairing at full corpus scale composes the two: LSH buckets
  first, exact cosine inside buckets (``neardup_pairs`` is the
  in-bucket verifier).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

LSH_BITS = 8


_SEQ_DOT = None


def _seq_dot_udf():
    """Row-vectorized, dimension-sequential dot product (float64).
    Addition order is identical to a left-associated SQL sum, so the
    result is bit-identical to the DuckDB oracle. Built lazily — the
    pandas_udf decorator needs an active session to parse its DDL."""
    global _SEQ_DOT
    if _SEQ_DOT is None:

        def kernel(a: pd.Series, b: pd.Series) -> pd.Series:
            A = np.stack(a.to_numpy())
            B = np.stack(b.to_numpy())
            acc = A[:, 0].astype(np.float64) * B[:, 0].astype(np.float64)
            for i in range(1, A.shape[1]):
                acc = acc + A[:, i].astype(np.float64) * B[:, i].astype(np.float64)
            return pd.Series(acc)

        from pyspark.sql.types import DoubleType

        _SEQ_DOT = F.pandas_udf(kernel, DoubleType())
    return _SEQ_DOT


def dot(a, b, dim: int | None = None):
    return _seq_dot_udf()(a, b)


def norm(a, dim: int | None = None):
    return F.sqrt(_seq_dot_udf()(a, a))


def neardup_pairs(emb: DataFrame, dim: int = 64, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute-force baseline;
    see module docstring for the LSH-composed scale path)."""
    a = emb.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        norm(F.col("embedding"), dim).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        norm(F.col("embedding"), dim).alias("nb"),
    )
    return (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn(
            "cos", dot(F.col("ea"), F.col("eb"), dim) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cos") >= threshold)
        .select("va", "vb", "cos")
        .orderBy("va", "vb")
    )


def neardup_pairs_lsh(
    emb: DataFrame,
    dim: int = 64,
    threshold: float = 0.4,
    bits: int = LSH_BITS,
) -> DataFrame:
    """Near-duplicate pairs at corpus scale: LSH-bucket equi-join +
    in-bucket exact cosine (the composition the module docstring
    promises — ``neardup_pairs`` is the O(n²) small-scale baseline).

    The only join is an equi-join on the bucket key, so the n² space
    is never touched: at 10⁹ vectors with ``bits``-bit buckets each
    bucket holds ~n/2^bits vectors and the pair space shrinks by
    ~2^bits. Sign-bucket LSH guarantees recall only for pairs agreeing
    on the leading sign bits (threshold 0.4 pairs almost always do;
    raise recall via multi-probe or fewer bits). Candidate scoring is
    the same dim-sequential Arrow kernel → cosines bit-match DuckDB.

    Delegates to ``neardup_pairs_lsh_multi`` with a single table over
    dims [1, 1+bits) — identical semantics (the first table of the
    family IS this bucket), and the multi plan shape is the one that
    avoids the Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND binding
    bug: hand-built variants of the same pipeline (UDF norms on the
    self-join inputs, or even slim candidate join + UDF join-back)
    fail to bind when dd07 is the first query planned in a fresh
    session; the posexploded-table shape does not."""
    return neardup_pairs_lsh_multi(
        emb, dim=dim, threshold=threshold, n_tables=1, bits=bits
    )


def lsh_bucket_slice(col, start: int, bits: int):
    """Sign-bit bucket over dims [start, start+bits) — one hash table
    of a multi-table LSH family."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(start), F.lit(start + bits - 1)),
            lambda i: F.when(F.element_at(col, i) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            ),
        ),
        "",
    )


def neardup_pairs_lsh_multi(
    emb: DataFrame,
    dim: int = 64,
    threshold: float = 0.4,
    n_tables: int = 4,
    bits: int = 6,
) -> DataFrame:
    """Multi-table LSH near-dup: ``n_tables`` independent sign-bucket
    tables over disjoint dim slices; a pair is a candidate if it
    collides in ANY table (union), then verified with exact cosine.

    Recall for a pair with angle θ is 1 − (1 − p^bits)^n_tables with
    p = 1 − θ/π — ≈0.87 for cos 0.9 at L=4, b=6, tunable to ~1 with
    more tables, while each table's join stays an equi-join on a
    short bucket key (standard Indyk-Motwani L-tables construction;
    the single-table variant ``neardup_pairs_lsh`` trades recall for
    fewer shuffles).

    Plan shape, deliberately: candidate generation and the
    cross-table union-dedup run over SLIM (id, id) rows — the 128-dim
    payloads would otherwise ride every duplicate collision through
    the dedup shuffle (measured 20× slower that way). Embeddings and
    precomputed norms are joined back only for the surviving distinct
    pairs. The pandas-UDF norm is projected BEFORE any explode/join
    (UDF projections mixed into exploded self-join inputs trip a
    Catalyst binding bug, INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)."""
    with_norm = emb.select(
        "vec_id", "embedding", norm(F.col("embedding"), dim).alias("nrm")
    )
    buckets = emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    lsh_bucket_slice(F.col("embedding"), 1 + t * bits, bits)
                    for t in range(n_tables)
                ]
            )
        ).alias("table_id", "bucket"),
    )
    a = buckets.select("table_id", "bucket", F.col("vec_id").alias("va"))
    b = buckets.select("table_id", "bucket", F.col("vec_id").alias("vb"))
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )
    x = with_norm.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    y = with_norm.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    scored = cand.join(x, "va").join(y, "vb").withColumn(
        "cos", dot(F.col("ea"), F.col("eb"), dim) / (F.col("na") * F.col("nb"))
    )
    return (
        scored.filter(F.col("cos") >= threshold)
        .select("va", "vb", "cos")
        .orderBy("va", "vb")
    )


def topk_bruteforce(
    emb: DataFrame, n_queries: int = 5, k: int = 10, dim: int = 64
) -> DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors. The
    query side is broadcast; the corpus is scanned once."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding"), dim).alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        norm(F.col("embedding"), dim).alias("c_norm"),
    )
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("c_id")).withColumn(
        "cos",
        dot(F.col("q_emb"), F.col("c_emb"), dim) / (F.col("q_norm") * F.col("c_norm")),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
        .orderBy("q_id", "rank")
    )


KMEANS_SAMPLE = 4096
KMEANS_ITERS = 8
KMEANS_SEED = 13


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int,
    sample_n: int = KMEANS_SAMPLE,
    iters: int = KMEANS_ITERS,
    seed: int = KMEANS_SEED,
):
    """Spherical k-means centroids from a deterministic corpus sample
    — the real IVF training step (replaces the first-``n_cells``
    stand-in; VERDICT r4 #8).

    Sampling is a distributed top-``sample_n`` by xxhash64(vec_id,
    seed) — TakeOrderedAndProject, no global sort shuffle, and the
    same rows every run regardless of partitioning. Training runs on
    the driver in numpy (k-means++ init from a seeded PCG64, Lloyd
    iterations with argmax-cosine assignment, ties to the lowest cell,
    empty cells keep their previous centroid) — deterministic end to
    end PER BLAS BUILD, so the recall ladder stays pinned on a given
    machine. Scope note (ADVICE r5): the `X @ C.T` / `mean` / `norm`
    reductions here use BLAS/pairwise summation whose association is
    build-dependent, unlike the association-pinned spec kernels — if
    cross-machine bit-identity of the CENTROIDS is ever needed, swap
    these for spec.seq_dot_rows-style sequential folds. The ss06
    oracle sidesteps this by baking the trained centroids into the
    SQL as literals (see queries_traindata), so the certified
    probe/assign/top-k path is centroid-value-independent.

    10^9-vector regime: centroid quality needs ~100-1000 samples per
    cell, not a corpus fraction — sample_n = max(256·n_cells, 10^5)
    collected to the driver is ~25 MB of float32 at dim 64 and the
    Lloyd pass is O(sample_n · n_cells · dim · iters) ≈ seconds for
    4096 cells; the corpus itself is touched only by the (map-side,
    broadcast) assignment join, exactly like the head-centroid path.

    Returns a list of (cid, [float, ...]) rows, unit-normalized.
    """
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id", F.lit(seed)), "vec_id")
        .limit(sample_n)
        .collect()
    )
    # stable training order independent of collection order
    rows = sorted(rows, key=lambda r: r.vec_id)
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return _kmeans_train(X, n_cells, iters, seed)


def _kmeans_train(X: np.ndarray, n_cells: int, iters: int, seed: int):
    """The numpy Lloyd trainer proper, on the ALREADY-SORTED sample
    matrix. Factored out of kmeans_centroids so the ss06 oracle
    builder (which loads the same rows via DuckDB — when the corpus
    fits inside KMEANS_SAMPLE the 'sample' is just the full table
    sorted by vec_id) calls the IDENTICAL code path: same BLAS build,
    same association order, so the centroids the oracle bakes into
    SQL are bit-equal to the ones the Spark query trains."""
    nrm = np.linalg.norm(X, axis=1)
    X = X[nrm > 0] / nrm[nrm > 0, None]
    n = X.shape[0]
    if n == 0:
        raise ValueError("k-means sample is empty")
    n_cells = min(n_cells, n)
    rng = np.random.default_rng(seed)
    # k-means++ (cosine distance = 1 - dot on unit vectors) with the
    # standard incremental best-similarity update: one X @ c per new
    # center, O(n_cells · n · dim) total — re-scoring every prior
    # center per step would be O(n_cells² · n · dim), hours at the
    # 4096-cell / 10^6-sample regime the docstring budgets for.
    # np.maximum running max == np.max over the stacked rows, so the
    # sampled sequence (and therefore the centroids) is unchanged.
    cents = [X[int(rng.integers(n))]]
    best = X @ cents[0]
    for _ in range(1, n_cells):
        d = np.clip(1.0 - best, 0.0, None)
        tot = d.sum()
        if tot <= 0:
            idx = int(rng.integers(n))
        else:
            idx = int(rng.choice(n, p=d / tot))
        cents.append(X[idx])
        best = np.maximum(best, X @ X[idx])
    C = np.stack(cents)
    for _ in range(iters):
        sims = X @ C.T
        # argmax with ties to the LOWEST cell id (np.argmax semantics)
        assign = np.argmax(sims, axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                mn = np.linalg.norm(m)
                if mn > 0:
                    C[j] = m / mn
    return [(int(j), [float(x) for x in C[j]]) for j in range(n_cells)]


def topk_ivf(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    dim: int = 64,
    n_cells: int = 4,
    probe: int = 1,
    centroids: str = "head",
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its
    nearest-centroid cell, then search the query's ``probe`` nearest
    cells. ``centroids`` picks the training step: "head" uses the
    first ``n_cells`` corpus vectors (deterministic, and what the
    ss03/ss04 DuckDB oracles replay — centroid choice only shapes the
    candidate sets, so the oracle-checked variant keeps it
    SQL-expressible), "kmeans" trains real spherical k-means on a
    deterministic sample (kmeans_centroids; recall ≥ the head variant
    by construction of better-centered cells — pinned in
    tests/test_similarity_recall.py).

    Scale shape: assignment is a broadcast cross-join against
    ``n_cells`` rows (no corpus shuffle) + one window per vec_id;
    search is an equi-join on cell — candidates shrink
    ~n·probe/n_cells. Each corpus vector lives in exactly one cell
    and a query's probed cells are distinct, so no pair dedup is
    needed (the recall ladder vs exact search is pinned in
    tests/test_similarity_recall.py)."""
    if centroids == "kmeans":
        trained = kmeans_centroids(emb, n_cells)
        cents = emb.sparkSession.createDataFrame(
            trained, "cid long, c_emb array<double>"
        ).select("cid", "c_emb", norm(F.col("c_emb"), dim).alias("c_norm"))
    elif centroids == "head":
        cents = emb.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("c_emb"),
            norm(F.col("embedding"), dim).alias("c_norm"),
        )
    else:
        raise ValueError(f"unknown centroids source {centroids!r}")
    with_norm = emb.select(
        "vec_id", "embedding", norm(F.col("embedding"), dim).alias("nrm")
    )
    scored_cells = with_norm.join(F.broadcast(cents)).withColumn(
        "ccos",
        dot(F.col("embedding"), F.col("c_emb"), dim)
        / (F.col("nrm") * F.col("c_norm")),
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid").asc())
    ranked_cells = scored_cells.withColumn("rn", F.row_number().over(w_assign))
    assigned = ranked_cells.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "nrm", F.col("cid").alias("cell")
    )
    q = (
        ranked_cells.filter(
            (F.col("vec_id") < n_queries) & (F.col("rn") <= probe)
        )
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_norm"),
            F.col("cid").alias("cell"),
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_norm"),
        "cell",
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cos",
            dot(F.col("q_emb"), F.col("c_emb"), dim)
            / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
        .orderBy("q_id", "rank")
    )


def lsh_bucket(col, bits: int = LSH_BITS):
    """Axis-aligned hyperplane LSH: sign bits of the first ``bits``
    components (the first table of the multi-table family)."""
    return lsh_bucket_slice(col, 1, bits)


def topk_lsh(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    dim: int = 64,
    bits: int = LSH_BITS,
) -> DataFrame:
    """ANN top-k within the query's LSH bucket (the scale path:
    equi-join on bucket instead of a cross join).

    Plan shape per the Catalyst binding-bug lesson (see
    neardup_pairs_lsh): candidate generation runs on SLIM
    (vec_id, bucket) rows with the bucket routed through a 1-element
    posexplode — the Generate node is what forces a clean attribute
    re-base (slim joins without it, UDF-norms on the join sides, and
    a localCheckpoint barrier all still fail to bind when this is the
    first query planned in a session) — and embeddings + the
    pandas-UDF norm join back for candidates only."""
    buckets = emb.select(
        "vec_id",
        F.posexplode(F.array(lsh_bucket(F.col("embedding"), bits))).alias(
            "table_id", "bucket"
        ),
    ).select("vec_id", "bucket")
    qb = buckets.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "bucket"
    )
    cand = (
        buckets.join(F.broadcast(qb), "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("c_id"))
    )
    with_norm = emb.select(
        "vec_id", "embedding", norm(F.col("embedding"), dim).alias("nrm")
    )
    x = with_norm.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_norm"),
    )
    y = with_norm.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_norm"),
    )
    scored = (
        cand.join(x, "q_id")
        .join(y, "c_id")
        .withColumn(
            "cos",
            dot(F.col("q_emb"), F.col("c_emb"), dim)
            / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
        .orderBy("q_id", "rank")
    )


def topk_bruteforce_blocked(
    emb: DataFrame, n_queries: int = 5, k: int = 10, dim: int = 64
) -> DataFrame:
    """ss01's exact semantics with the 100 TB scan shape: ONE
    mapInPandas pass scores each Arrow batch against the broadcast
    query matrix in numpy (dimension-sequential accumulation — the
    same association order as _seq_dot_udf, so per-pair cosines are
    bit-identical to ss01 and its DuckDB oracle) and emits only the
    per-batch top-k candidates per query. The shuffle that follows
    carries ≤ batches × queries × k rows instead of ss01's
    queries × corpus join fan-out; the global window then picks the
    true top-k (per-partition top-k is a superset of the global
    answer, so the recombination is exact)."""
    from collections.abc import Iterator

    spark = emb.sparkSession
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    q_list = [
        (int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
        for r in sorted(qrows, key=lambda r: r.vec_id)
    ]
    for qid, qv in q_list:
        if qv.shape[0] != dim:
            raise ValueError(
                f"query {qid} has dim {qv.shape[0]}, expected {dim}"
            )

    def _seq_dot_mat(C: np.ndarray, v: np.ndarray) -> np.ndarray:
        acc = C[:, 0] * v[0]
        for i in range(1, C.shape[1]):
            acc = acc + C[:, i] * v[i]
        return acc

    q_bc = spark.sparkContext.broadcast(
        [(qid, qv, float(np.sqrt(_seq_dot_mat(qv[None, :], qv)[0]))) for qid, qv in q_list]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        queries = q_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if C.shape[1] != dim:
                raise ValueError(
                    f"embedding dim {C.shape[1]} != declared dim {dim}"
                )
            c_ids = pdf["vec_id"].to_numpy()
            # c_norm = sqrt(seq-dot(c, c)), same order as the UDF
            acc = C[:, 0] * C[:, 0]
            for i in range(1, C.shape[1]):
                acc = acc + C[:, i] * C[:, i]
            c_norm = np.sqrt(acc)
            out_q, out_c, out_cos = [], [], []
            for qid, qv, qn in queries:
                cos = _seq_dot_mat(C, qv) / (qn * c_norm)
                keep = c_ids != qid  # self-pair excluded like ss01
                cs, ids = cos[keep], c_ids[keep]
                # per-batch candidate cut: top-k by (cos desc, id asc)
                order = np.lexsort((ids, -cs))[:k]
                out_q.extend([qid] * len(order))
                out_c.extend(ids[order])
                out_cos.extend(cs[order])
            yield pd.DataFrame(
                {"q_id": out_q, "c_id": out_c, "cos": out_cos}
            )

    cands = emb.select("vec_id", "embedding").mapInPandas(
        run, schema="q_id long, c_id long, cos double"
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
        .orderBy("q_id", "rank")
    )

"""Deduplication operators for large-scale training-data pipelines.

All hashing is md5-based so results are engine-portable (the DuckDB
oracle computes identical signatures). Every operator is pure
DataFrame API — shingling, minhashing, banding, and pair generation
are JVM-side expressions (no Python UDFs anywhere in this module).

Scale notes (100 TB):
- exact: one hash-shuffle on the text digest; map-side partial agg
  makes the shuffle carry only (digest, partial count, partial min).
- minhash-LSH: signatures are embarrassingly parallel; the only
  shuffle is the band-key self-join. Band keys are md5s → uniformly
  distributed, no skew. Pair verification (jaccard) touches only
  candidates, never the n² space.
- ngram-jaccard: the shingle self-join is the skew point (a hot
  shingle appears in many docs) — ``jaccard_pairs`` drops shingles
  above a document-frequency cap, the standard scalable mitigation
  (same spirit as the reference's row caps,
  PageLinkSummaryStep.java:112-114).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
BAND_ROWS = 2
SHINGLE_N = 3
SIMHASH_BITS = 32
HOT_SHINGLE_DF_CAP = 1000


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def _shingles(tok_col, n: int = SHINGLE_N):
    """Distinct n-token shingles, docs shorter than n excluded."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(tok_col) - n),
            lambda i: F.array_join(F.slice(tok_col, i + 1, n), " "),
        )
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one keeper (min doc_id) per distinct
    text digest + group size."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("group_size"))
        .orderBy("keeper")
    )


def shingle_table(docs: DataFrame) -> DataFrame:
    toks = docs.select("doc_id", _tokens().alias("w"))
    return (
        toks.filter(F.size("w") >= SHINGLE_N)
        .select("doc_id", F.explode(_shingles(F.col("w"))).alias("shingle"))
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, seed, minhash): minhash_s = min over shingles of
    md5(s || ':' || shingle) — lexicographic min over hex digests,
    identical in any engine with md5."""
    toks = docs.select("doc_id", _tokens().alias("w")).filter(
        F.size("w") >= SHINGLE_N
    )
    sh = toks.select("doc_id", _shingles(F.col("w")).alias("shingles"))
    sigs = sh.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_hashes - 1)),
                lambda s: F.array_min(
                    F.transform(
                        F.col("shingles"),
                        lambda x: F.md5(F.concat(s.cast("string"), F.lit(":"), x)),
                    )
                ),
            )
        ).alias("seed", "minhash"),
    )
    return sigs


def lsh_candidate_pairs(
    docs: DataFrame, n_hashes: int = N_MINHASH, band_rows: int = BAND_ROWS
) -> DataFrame:
    """MinHash banding: docs sharing any full band of signature rows
    become a candidate pair. Self-join on (band, band_key) — band keys
    are hashes, uniformly spread, so the shuffle has no skew."""
    sigs = minhash_signatures(docs, n_hashes)
    bands = (
        sigs.withColumn("band", (F.col("seed") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(F.array_sort(F.collect_list("minhash")), "|")
            ).alias("band_key")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.1, df_cap: int = HOT_SHINGLE_DF_CAP
) -> DataFrame:
    """Exact n-gram Jaccard over shingle sets: self-join on shared
    shingles, |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. Hot shingles
    (document frequency > df_cap) are dropped before the join — the
    skew guard that keeps the join linear at corpus scale."""
    sh = shingle_table(docs)
    rare = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") <= df_cap
    )
    sh = sh.join(rare.select("shingle"), "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Token-weighted SimHash: bit j of md5(token) votes ±1 weighted by
    the token's occurrence count; signature bit = vote sum > 0.

    Shuffle-lean formulation: the first ``bits`` md5 bits are packed
    into ONE integer per (doc, token) row (``conv(hex, 16, 10)``), and
    the per-bit votes become ``bits`` conditional sum-aggregates in a
    single groupBy — no bit explosion, so the shuffle carries one row
    per (doc, token) instead of ``bits``× that (the round-1 plan
    inflated pre-shuffle volume 32×). Exact-integer identity with the
    per-bit vote formulation: vote_j = 2·Σ(cnt·bit_j) − Σcnt, and
    vote_j > 0 ⟺ 2·s_j > total."""
    assert bits <= 32, "bit pack uses the first 8 hex chars (32 bits)"
    tok_counts = (
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        # big-endian pack: hex digit d (weight 2^(3−j%4) at position
        # j//4) lands at integer bit (31 − j), matching the oracle's
        # instr-based per-digit extraction exactly
        .withColumn(
            "hbits", F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
        )
    )
    bit_j = lambda j: F.shiftright(F.col("hbits"), 31 - j).bitwiseAND(F.lit(1))
    aggs = [F.sum("cnt").alias("total")] + [
        F.sum(F.col("cnt") * bit_j(j)).alias(f"s{j}") for j in range(bits)
    ]
    votes = tok_counts.groupBy("doc_id").agg(*aggs)
    sig = sum(
        (
            F.when(F.col(f"s{j}") * 2 > F.col("total"), F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            for j in range(bits)
        ),
        F.lit(0),
    ).cast("long")
    return votes.select("doc_id", sig.alias("simhash")).orderBy("doc_id")


SUBSTR_WINDOW_TOKENS = 8
HOT_WINDOW_DF_CAP = 1000


def substring_window_pairs(
    docs: DataFrame,
    window: int = SUBSTR_WINDOW_TOKENS,
    df_cap: int = HOT_WINDOW_DF_CAP,
) -> DataFrame:
    """Verbatim-substring duplication at window granularity (the
    exact-substring criterion of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", approximated without
    a distributed suffix array): two docs share a ``window``-token
    verbatim sliding window ⟺ they contain a common substring of
    ≥ ``window`` tokens. Map-side per doc: DISTINCT md5 of every
    sliding window; ONE equi-join shuffle on the window hash; windows
    appearing in more than ``df_cap`` docs (boilerplate headers,
    license blocks) are dropped before the join — the skew guard that
    keeps the join linear at corpus scale, same shape as
    jaccard_pairs' hot-shingle cap. Returns
    (doc_a, doc_b, shared_windows) with shared_windows = number of
    distinct window hashes the pair has in common."""
    wins = _window_hashes(docs, window).withColumnRenamed("g", "win")
    # df filter via count-agg + BROADCAST anti-join on the hot set,
    # not a window count: `count(*) over (partition by win)` routed
    # every (doc, win) row of a hot key into ONE task — exactly the
    # boilerplate/license windows the cap exists to drop (a window in
    # 10M docs = 10M rows in one task, no map-side compression, and
    # AQE skew-split does not apply to window functions). The groupBy
    # count is skew-safe by construction (hash-agg partially
    # aggregates each key map-side, so the reduce side sees ≤
    # n_partitions rows per key — the "salted two-phase" shape for
    # free). The hot set is SMALL IN EXPECTATION (≤ total_windows /
    # df_cap keys can exceed the cap — still potentially billions at
    # 100 TB with a low cap), so the anti-join carries NO forced
    # broadcast hint: AQE sees the agg output's actual runtime size
    # and converts to a broadcast-hash anti-join when it fits (the
    # common case — wins filtered map-side via the local shuffle
    # reader), and degrades gracefully to a shuffled anti-join when a
    # pathological corpus/df_cap pushes the hot set past the
    # broadcast threshold, instead of OOMing the driver on a forced
    # hint (ADVICE r5). Cost: the explode→md5→distinct
    # subtree is evaluated once for the hot-set agg and once for the
    # self-join input (whose two aliases share one ReusedExchange) —
    # both map-parallel linear passes, vs. the window shape's
    # single-task hot-key funnel.
    hot = (
        wins.groupBy("win")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("win")
    )
    wins = wins.join(hot, "win", "left_anti")
    a, b = wins.alias("a"), wins.alias("b")
    return (
        a.join(
            b,
            (F.col("a.win") == F.col("b.win"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared_windows"))
        .orderBy("doc_a", "doc_b")
    )


def _window_hashes(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, g): DISTINCT md5 of every sliding ``n``-token window
    per doc — the ONE window-hash construction shared by
    substring_window_pairs (dd10) and decontaminate_flags (dd12), so
    the two operators (and their hard-coded oracle replays) cannot
    fork window semantics."""
    toks = docs.select("doc_id", _tokens().alias("w"))
    return (
        toks.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - n),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice(F.col("w"), i + 1, n))
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )


DECONTAM_NGRAM = 8


def decontaminate_flags(
    docs: DataFrame, benchmark: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Lee et al.
    training-data hygiene step): flag corpus documents sharing any
    verbatim ``n``-token n-gram with an evaluation set, so they can be
    dropped before training. Returns (doc_id, n_hits) per contaminated
    doc — n_hits = number of DISTINCT benchmark n-grams the doc
    contains.

    Scale shape: the benchmark side is an eval set (MBs, thousands of
    docs), so its distinct n-gram hash set BROADCASTS and the corpus
    side is a map-side hash probe — the 100 TB corpus is scanned once
    with NO shuffle except the final per-doc partial-agg count. The
    window construction is _window_hashes, shared with
    substring_window_pairs."""
    bench = _window_hashes(benchmark, n).select("g").distinct()
    corpus = _window_hashes(docs, n)
    # no trailing orderBy: the operator composes (build_training_corpus
    # anti-joins on it, discarding order) — presentation sort lives in
    # the dd12 query wrapper (ADVICE r5)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def incremental_dedup(
    new_docs: DataFrame,
    existing_docs: DataFrame,
    hash_col: str | None = None,
) -> DataFrame:
    """Cross-snapshot ingestion dedup: drop incoming docs whose
    content hash already exists in the reference corpus (left-anti on
    md5 — at scale the reference side is a bucketed hash table and the
    join colocates on the hash), then exact-dedup within the batch
    (min-id keeper + duplicate count). The incremental complement of
    exact_dedup: a re-crawl batch joins against yesterday's corpus
    instead of re-hashing it.

    ``hash_col`` is the EXPLICIT opt-in for a pre-hashed reference:
    name the column holding md5(text) — the reference corpus stored
    as a table BUCKETED by that column — and the bucketed scan's
    output partitioning feeds the distinct AND the anti-join with no
    exchange, so only the (small) incoming batch shuffles
    (plan-pinned in tests/test_traindata_ops.py::
    test_incremental_dedup_bucketed). The caller asserts the hash
    scheme by naming the column; inferring it from column presence
    would silently mis-dedup against a stale or differently-hashed
    column."""
    if hash_col is not None:
        ex = existing_docs.select(
            F.col(hash_col).alias("text_hash")
        ).distinct()
    else:
        ex = existing_docs.select(F.md5("text").alias("text_hash")).distinct()
    inc = new_docs.select("doc_id", F.md5("text").alias("text_hash"))
    fresh = inc.join(ex, "text_hash", "left_anti")
    return (
        fresh.groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("batch_dupes"))
        .orderBy("keeper")
    )

"""Unit tests for the round-4 training-data operators: verbatim
window substring-dedup (dd10) and repetition metrics (ta08). The
sf0.01 DuckDB oracle parity runs in test_entry_contract; these pin
the semantics on planted corpora plus the plan-shape claims."""

import pytest

from grisp_spark.operators import dedup, textstats
from grisp_spark.plans import physical_plan


BASE8 = "w1 w2 w3 w4 w5 w6 w7 w8"


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, BASE8 + " xa xb xc"),          # 4 sliding windows
        (2, "ya yb " + BASE8),             # shares exactly the base window
        (3, BASE8 + " xa xb xc"),          # exact dup of doc 1
        (4, "za zb zc zd ze zf zg zh zi"),  # unrelated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_window_pairs_planted(spark, planted):
    got = {
        (r.doc_a, r.doc_b): r.shared_windows
        for r in dedup.substring_window_pairs(planted, window=8).collect()
    }
    # doc1/doc3 share all 4 windows; the base window is the only one
    # fully contained in both doc1(doc3) and doc2
    assert got == {(1, 2): 1, (1, 3): 4, (2, 3): 1}


def test_substring_hot_window_cap(spark, planted):
    """df_cap=1 keeps only windows confined to a single doc — every
    shared window is by definition in ≥2 docs, so the capped join
    must produce nothing (the skew guard drops boilerplate)."""
    assert dedup.substring_window_pairs(planted, window=8, df_cap=1).count() == 0


def test_substring_join_is_equi(spark, planted):
    plan = physical_plan(dedup.substring_window_pairs(planted, window=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_substring_df_filter_skew_safe(spark):
    """The hot-window df cap must NOT be a window function partitioned
    by `win` — that funnels every row of a hot key (the boilerplate
    blocks the cap exists to drop) into one task at corpus scale
    (VERDICT r4 #3). The skew-safe shape: map-side-partial count agg →
    hot set → anti-join with NO forced broadcast hint (AQE converts
    to broadcast when the runtime hot set fits, and falls back to a
    shuffled anti-join instead of a driver OOM when it doesn't —
    ADVICE r5). A corpus where one window appears in EVERY doc must
    still drop it under the cap."""
    docs = spark.createDataFrame(
        [
            (i, "common boiler plate header tokens one two three "
                + f"unique{i} " * 8)
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    df = dedup.substring_window_pairs(docs, window=8, df_cap=10)
    plan = physical_plan(df)
    assert "Window" not in plan, plan  # no per-key single-task funnel
    assert "HashAggregate" in plan, plan  # hot set from partial agg
    # no FORCED broadcast hint on the hot set (AQE may still pick a
    # broadcast join at runtime when the hot set is actually small)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical and "ResolvedHint" not in logical, (
        logical
    )
    # the shared header window (df=20 > cap) is dropped; the per-doc
    # unique tails share nothing → no surviving pairs
    assert df.count() == 0
    # and with the cap above df, the header window pairs every doc
    assert (
        dedup.substring_window_pairs(docs, window=8, df_cap=50).count() > 0
    )


def test_repetition_metrics_values(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textstats.repetition_metrics(docs).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 4
    assert r1.distinct_token_ratio == pytest.approx(0.5)
    assert r1.top_token_frac == pytest.approx(3 / 4)
    # bigrams: "a a", "a a", "a b" → top frac 2/3
    assert r1.top_bigram_frac == pytest.approx(2 / 3)
    r2 = rows[2]
    assert (r2.n_tokens, r2.top_bigram_frac) == (1, 0.0)
    assert r2.top_token_frac == 1.0
    r3 = rows[3]
    assert (r3.n_tokens, r3.distinct_token_ratio, r3.top_token_frac) == (0, 0.0, 0.0)


def test_repetition_is_map_only(spark):
    """The whole metric computation happens inside the row (sort +
    fold) — the plan must contain no aggregation and no join; the
    only exchange allowed is the final presentation sort."""
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = physical_plan(textstats.repetition_metrics(docs))
    assert "HashAggregate" not in plan and "ObjectHashAggregate" not in plan
    assert "Join" not in plan


def test_tfidf_topk_values(spark):
    """3-doc corpus, hand-checked: 'cat' df=1 in doc1 → tfidf 3;
    shared 'the' df=3 → tfidf tf*3/3 = tf."""
    docs = spark.createDataFrame(
        [
            (1, "the cat the"),
            (2, "the dog"),
            (3, "the dog dog"),
        ],
        "doc_id long, text string",
    )
    from grisp_spark.operators.textstats import tfidf_topk

    rows = [
        (r.doc_id, r.term, r.tf, r.df, r.tfidf, r.rank)
        for r in tfidf_topk(docs, k=2).collect()
    ]
    assert rows == [
        # doc1: cat tfidf 1*3/1=3 beats the 2*3/3=2
        (1, "cat", 1, 1, 3.0, 1),
        (1, "the", 2, 3, 2.0, 2),
        # doc2: dog 1*3/2=1.5 beats the 1*3/3=1
        (2, "dog", 1, 2, 1.5, 1),
        (2, "the", 1, 3, 1.0, 2),
        # doc3: dog 2*3/2=3 beats the 1
        (3, "dog", 2, 2, 3.0, 1),
        (3, "the", 1, 3, 1.0, 2),
    ]


def test_tfidf_construction_runs_no_job(spark):
    """Corpus size N must ride inside the plan (broadcast 1-row agg),
    not an eager docs.count() at construction time — that was a
    separate full-corpus scan per invocation (VERDICT r4 #4)."""
    from grisp_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "the cat the"), (2, "the dog")], "doc_id long, text string"
    )
    dag = spark.sparkContext._jsc.sc().dagScheduler()
    before = dag.numTotalJobs()
    df = tfidf_topk(docs, k=1)
    assert dag.numTotalJobs() == before, "plan construction ran a Spark job"
    assert df.count() == 2  # still evaluates correctly afterwards


def test_ss05_matches_ss01_rows(spark, sf_dir):
    """The blocked Arrow scan must reproduce ss01's exact rows —
    same cosines bit-for-bit (shared dimension-sequential kernel
    order), same ranks."""
    from grisp_spark.operators import similarity
    from grisp_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = [tuple(r) for r in similarity.topk_bruteforce(emb).collect()]
    b = [tuple(r) for r in similarity.topk_bruteforce_blocked(emb).collect()]
    assert a == b


def test_ss05_no_corpus_join(spark, sf_dir):
    """The whole scan is one mapInPandas stage — the plan must contain
    no join at all (ss01 fans out queries × corpus through a
    broadcast join; the blocked scan must not)."""
    from grisp_spark.operators import similarity
    from grisp_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = physical_plan(similarity.topk_bruteforce_blocked(emb))
    assert "Join" not in plan, plan


def test_context_chunks_window_stride_clip(spark):
    """5 turns, window 4, stride 2 → starts 0/2/4 with tail clipping:
    [t0..t3], [t2..t4], [t4]."""
    from grisp_spark.queries_traindata import CHUNK_STRIDE, CHUNK_TURNS

    assert (CHUNK_TURNS, CHUNK_STRIDE) == (4, 2)
    conv = spark.createDataFrame(
        [("c", i, f"t{i}") for i in range(5)] + [("d", 0, "solo")],
        "conv_id string, turn_idx int, text string",
    )
    from pyspark.sql import functions as F

    t = conv.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
            lambda s: s.text,
        ).alias("turns")
    )
    chunks = t.select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.size("turns") - 1, F.lit(2))).alias("s"),
        "turns",
    ).select(
        "conv_id", "s",
        F.array_join(F.slice(F.col("turns"), F.col("s") + 1, 4), "\n").alias("x"),
    )
    got = {(r.conv_id, r.s): r.x for r in chunks.collect()}
    assert got == {
        ("c", 0): "t0\nt1\nt2\nt3",
        ("c", 2): "t2\nt3\nt4",
        ("c", 4): "t4",
        ("d", 0): "solo",
    }


def test_incremental_dedup_planted(spark):
    """Re-crawled doc drops in the anti-join; a batch-internal dup
    collapses to the min-id keeper with its count."""
    existing = spark.createDataFrame(
        [(1, "old news"), (2, "evergreen page")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "evergreen page"),   # re-crawl → dropped
            (11, "fresh story"),
            (12, "fresh story"),      # batch-internal dup
            (13, "another new one"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.keeper: r.batch_dupes
        for r in dedup.incremental_dedup(incoming, existing).collect()
    }
    assert rows == {11: 2, 13: 1}


def test_decontaminate_planted(spark):
    """A corpus doc carrying a verbatim 8-token benchmark span is
    flagged with the distinct-overlap count; clean docs are absent."""
    bench = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta theta tail")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # carries the full 8-token benchmark prefix (2 shared
            # 8-gram windows: positions 1 and 2 of the bench text)
            (1, "x alpha beta gamma delta epsilon zeta eta theta tail y"),
            (2, "totally clean document with no overlap at all here"),
            (3, "alpha beta gamma delta epsilon zeta eta wrong"),  # 7-gram only
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.n_hits for r in
            dedup.decontaminate_flags(docs, bench).collect()}
    assert rows == {1: 2}


def test_decontaminate_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} body " + "tok " * 10) for i in range(20)],
        "doc_id long, text string",
    )
    plan = physical_plan(dedup.decontaminate_flags(docs, docs.limit(2)))
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan  # corpus side never shuffles to join


def test_pii_scrub_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.co or c.d@e-f.org, call 555-123-4567, "
                "host 10.0.0.1, port 8080"),
            (2, "no sensitive content"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textstats.pii_scrub(docs).collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_phone, r1.n_ipv4) == (2, 1, 1)
    # numbers counted on the ORIGINAL text: 555,123,4567 + 10,0,0,1 + 8080
    assert r1.n_number == 8
    scrubbed = ("mail <email> or <email>, call <phone>, "
                "host <ipv4>, port <number>")
    assert r1.scrubbed_len == len(scrubbed)
    r2 = rows[2]
    assert (r2.n_email, r2.n_phone, r2.n_ipv4, r2.n_number) == (0, 0, 0, 0)
    assert r2.scrubbed_len == len("no sensitive content")


def test_incremental_dedup_bucketed(spark):
    """dd11's 100 TB claim made concrete: with the reference corpus
    stored as a table BUCKETED by text_hash, the bucketed scan's
    partitioning feeds the distinct and the anti-join exchange-free —
    only the incoming batch (and the final keeper agg) shuffle. With
    an unbucketed reference the same plan needs one more exchange."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"body of document {i % 30}") for i in range(60)],
        "doc_id long, text string",
    )
    hashed = docs.select("doc_id", F.md5("text").alias("text_hash"))
    spark.sql("DROP TABLE IF EXISTS ref_corpus_bucketed")
    (hashed.write.bucketBy(8, "text_hash").sortBy("text_hash")
        .mode("overwrite").saveAsTable("ref_corpus_bucketed"))
    incoming = spark.createDataFrame(
        [(100 + i, f"body of document {i % 40}") for i in range(40)],
        "doc_id long, text string",
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join shape (not size) decides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        bucketed = dedup.incremental_dedup(
            incoming, spark.table("ref_corpus_bucketed"),
            hash_col="text_hash",
        )
        plain = dedup.incremental_dedup(incoming, docs)
        p_bucketed = physical_plan(bucketed)
        p_plain = physical_plan(plain)
        assert "Bucketed: true" in p_bucketed, p_bucketed
        assert p_bucketed.count("Exchange") < p_plain.count("Exchange"), (
            p_bucketed
        )
        # identical results either way
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ref_corpus_bucketed")

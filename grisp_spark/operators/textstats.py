"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting. All pure JVM-side expressions —
whole-stage-codegen friendly, no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
FP_MOD = 1_000_000_007


def _tokens(col: str = "text"):
    return F.filter(F.split(F.col(col), r"\s+"), lambda t: t != "")


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram-free heuristic language ID: stopword ratio over
    whitespace tokens (an honest stand-in for a fastText model — the
    classifier slot is this column)."""
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop / F.size(toks)).alias("stopword_ratio"),
        F.when(n_stop / F.size(toks) >= 0.02, F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("lang_pred"),
    ).orderBy("doc_id")


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword quality features + a composite
    score — the standard pre-training quality-filter shape."""
    toks = _tokens()
    n_tok = F.size(toks)
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[^A-Za-z0-9\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    avg_tok_len = (n_chars - (n_tok - 1)) / n_tok
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.4
        + (1 - punct / F.greatest(n_chars, F.lit(1))) * 0.4
        + F.least(n_stop / F.greatest(n_tok, F.lit(1)) * 10, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        punct.alias("n_punct"),
        avg_tok_len.alias("avg_token_len"),
        score.alias("quality"),
    ).orderBy("doc_id")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count
    (letters / digits / single punctuation — the pre-tokenizer split
    most BPE vocabularies assume)."""
    return docs.select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0)).alias("bpe_tokens"),
    ).orderBy("doc_id")


def fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling polynomial hash over tokens:
    acc ← (acc·31 + ascii(token[0]) + len(token)) mod 1e9+7.
    Sequential fold — engine-portable; a locality-sensitive-ish cheap
    doc signature for shard-level bookkeeping."""
    toks = _tokens()
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * 31 + F.ascii(t) + F.length(t), F.lit(FP_MOD)
        ),
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher/RefinedWeb-style repetition signals (Rae et al. 2021
    §A1.1), per doc with ZERO shuffle: the top-token / top-bigram
    fractions come from a sort + linear fold INSIDE the row (max run
    length of the sorted array == max frequency), so the stage is
    map-only — no (doc_id, token) explode-shuffle. High values flag
    degenerate repetition / boilerplate for the pre-training quality
    filter."""
    w = _tokens()

    def _max_freq(arr):
        z = F.lit(0).cast("long")
        one = F.lit(1).cast("long")
        return F.aggregate(
            F.array_sort(arr),
            F.struct(F.lit("").alias("prev"), z.alias("run"), z.alias("best")),
            lambda acc, t: F.struct(
                t.alias("prev"),
                F.when(t == acc.prev, acc.run + one).otherwise(one).alias("run"),
                F.greatest(
                    acc.best,
                    F.when(t == acc.prev, acc.run + one).otherwise(one),
                ).alias("best"),
            ),
            lambda acc: acc.best,
        )

    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    n_tok = F.size(w)
    n_big = F.size(bigrams)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (F.size(F.array_distinct(w)) / F.greatest(n_tok, F.lit(1))).alias(
            "distinct_token_ratio"
        ),
        (_max_freq(w) / F.greatest(n_tok, F.lit(1))).alias("top_token_frac"),
        (_max_freq(bigrams) / F.greatest(n_big, F.lit(1))).alias(
            "top_bigram_frac"
        ),
    ).orderBy("doc_id")


# PII / numeric scrub patterns — restricted to the Java-regex ∩ RE2
# common subset (\b, \d, {m,n}, char classes) so the DuckDB oracle
# runs the IDENTICAL patterns. Replacement order is this dict's
# insertion order (numbers LAST — it also matches digit runs inside
# phones/IPs, so specific patterns must consume theirs first);
# Spark regexp_replace replaces all matches by default, DuckDB needs
# the 'g' flag.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "number": r"\b\d+\b",
}


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII / numeric redaction audit — the training-data hygiene map
    step: per-doc match counts for each pattern (on the ORIGINAL
    text, so counts are order-independent) plus the length of the
    text after replacing every match with a <name> placeholder in
    PII_PATTERNS order. Pure JVM regex expressions, map-only, no
    shuffle — at 100 TB this is a scan-speed pass, and the scrubbed
    column would be written in place of text."""
    cols = [F.col("doc_id")]
    for name, pat in PII_PATTERNS.items():
        cols.append(
            F.regexp_count("text", F.lit(pat)).cast("long").alias(f"n_{name}")
        )
    scrub = F.col("text")
    for name, pat in PII_PATTERNS.items():
        scrub = F.regexp_replace(scrub, pat, f"<{name}>")
    cols.append(F.length(scrub).cast("long").alias("scrubbed_len"))
    return docs.select(*cols).orderBy("doc_id")


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document — the corpus-conditioned
    per-doc statistic shape (same plan as feature hashing / rare-term
    scoring at 100 TB): term document-frequencies aggregate once
    (partial-agg shuffle on term), broadcast-join back onto the
    per-doc term counts (vocab ≪ corpus), window top-k per doc.

    idf is the exact rational N/df rather than log(N/df): ranking is
    order-isomorphic (log is monotone) and every value stays an exact
    int ratio, so the DuckDB oracle matches bit-for-bit without
    transcendental-function cross-engine drift."""
    from pyspark.sql import Window as W

    toks = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size N rides INSIDE the plan as a broadcast 1-row agg
    # (a BroadcastNestedLoopJoin whose build side is one row — a
    # map-side scalar attach, zero shuffle): the previous eager
    # docs.count() at construction time was a separate full-corpus
    # job per invocation — an extra 100 TB scan before the real plan
    # even started.
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.col("n_docs") / F.col("df"))
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )

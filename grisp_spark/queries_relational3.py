"""Third relational batch: running window frames, keep-best dedup,
approximate sketches, exact percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from grisp_spark.sources.testdata import load_table


def q22_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) frame per user ordered by (ts, event_id).
    Both engines evaluate the running sum sequentially in frame order,
    so even the double accumulation is bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    # DECIMAL window sum: DuckDB evaluates frame aggregates with a
    # segment tree, Spark sequentially — double sums differ by ulps
    # and flip knife-edge formatting; exact decimal addition is
    # association-independent. avg derived from the exact sum.
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_value"),
            F.count("*").over(w).cast("long").alias("running_n"),
        )
        .withColumn("running_avg", F.col("running_value") / F.col("running_n"))
        .orderBy("user_id", "event_id")
    )


def q23_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best dedup shape: one canonical document per (lang,
    source) group by (n_chars desc, doc_id asc) — the standard
    keep-longest policy after near-dup clustering."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang", "source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "source", F.col("doc_id").alias("keeper"), "n_chars")
        .orderBy("lang", "source")
    )


def q24_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HLL distinct + approx quantile) — sketch
    outputs are engine-specific, so this is a rows-only check; the
    exact counterparts are oracle-checked in q02/q25."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q25_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        )
        .orderBy("event_type")
    )


ORACLES: dict[str, str] = {
    "q22_running_window": """
        SELECT user_id, event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 AS running_value,
               count(*) OVER w AS running_n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / (count(*) OVER w) AS running_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
        ORDER BY user_id, event_id
    """,
    "q23_dedup_keep_best": """
        SELECT lang, source, doc_id AS keeper, n_chars FROM (
            SELECT *, row_number() OVER (PARTITION BY lang, source
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
            FROM documents
        ) WHERE rn = 1 ORDER BY lang, source
    """,
    "q25_exact_percentiles": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q2")
}

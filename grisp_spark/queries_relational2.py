"""Second relational batch: classification, map-building aggregation,
salted two-phase aggregation, set operations, escaping, as-of join,
pivot, cube — the remaining SURVEY.md §2 shapes (F2, J6, C8, skew
hardening) plus the common OLAP patterns beyond the reference."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grisp_spark.sources.testdata import load_table


def q14_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 classification shape (DumpPageParser.java:139-173): a
    when/otherwise + rlike decision chain over document text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("text").rlike(r"\berror\b"), "error_report")
        .when(F.col("text").rlike(r"\b(join|merge)\b"), "join_heavy")
        .otherwise("article")
        .alias("doc_type"),
    ).orderBy("doc_id")


def q15_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 qid↔lang map-accumulation shape (ProcessWikiData.java:97-112):
    per user, the sorted (event_type → count) entry list the reference
    stores as an LMDB map value."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    # the sorted entry list is serialized 'k:v|k:v' — the driver's
    # canonicalizer can't hash array/struct cells, so driver-facing
    # queries emit scalar columns only
    return (
        per_type.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("event_type").alias("k"), F.col("cnt").alias("v")
                            )
                        )
                    ),
                    lambda e: F.concat_ws(":", e.k, e.v.cast("string")),
                ),
                "|",
            ).alias("entries")
        )
        .orderBy("user_id")
    )


def q16_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (the hot-key skew pattern from the
    north rule). conv/user ids hash to ONE salt deterministically, so
    partial distinct counts are disjoint and their sum is exact —
    results identical to the direct groupBy the oracle runs."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("user_id"), F.lit(16)))
    # decimal partials: the two-phase sum stays exact and associative,
    # so salting can't perturb the total vs the oracle's direct sum
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("n_part"),
        F.countDistinct("user_id").alias("u_part"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v_part"),
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("n_part").alias("n_events"),
            F.sum("u_part").alias("n_users"),
            F.sum("v_part").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


def q17_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-family: INTERSECT and EXCEPT as first-class plans."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = orders.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return (
        urgent.intersect(big)
        .exceptAll(low.distinct())
        .select(F.col("o_custkey").alias("custkey"))
        .orderBy("custkey")
    )


def q18_percent_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 percent-escaping (ProcessTranslation.java:236-237): '%'
    first, then ',' — plus the inverse, proving round-trip."""
    part = load_table(spark, sf_dir, "part")
    esc = F.regexp_replace(
        F.regexp_replace(F.col("p_name"), "%", "%25"), ",", "%2C"
    )
    return part.select(
        "p_partkey",
        esc.alias("escaped"),
        F.regexp_replace(
            F.regexp_replace(esc, "%2C", ","), "%25", "%"
        ).alias("roundtrip"),
    ).orderBy("p_partkey")


def q19_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark operator): for each error event,
    the same user's most recent click at or before it. Implemented as
    a union + last(ignorenulls) running window — one shuffle on
    (user_id), no range explosion; the DuckDB oracle uses its native
    ASOF JOIN, proving semantic equivalence."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("error_id"),
        F.col("event_id").alias("click_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id"),
        F.lit(None).cast("long").alias("click_id"),
    )
    merged = clicks.unionByName(errors)
    # clicks sort before errors at equal ts (kind asc: click rows have
    # click_id set) → >= semantics like ASOF JOIN
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("error_id").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("last_click", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("error_id").isNotNull() & F.col("last_click").isNotNull())
        .select(
            F.col("error_id"), F.col("user_id"), F.col("last_click").alias("click_id")
        )
        .orderBy("error_id")
    )


def q20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-nation order counts by priority class."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        j.groupBy("c_nationkey")
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .count()
        .select(
            "c_nationkey",
            F.coalesce("1-URGENT", F.lit(0)).alias("urgent"),
            F.coalesce("3-MEDIUM", F.lit(0)).alias("medium"),
            F.coalesce("5-LOW", F.lit(0)).alias("low"),
        )
        .orderBy("c_nationkey")
    )


def q21_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping ids — the
    grouping-sets machinery the reference lacks entirely."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLES: dict[str, str] = {
    "q14_classify": """
        SELECT doc_id,
               CASE WHEN n_chars < 200 THEN 'short'
                    WHEN regexp_matches(text, '\\berror\\b') THEN 'error_report'
                    WHEN regexp_matches(text, '\\b(join|merge)\\b') THEN 'join_heavy'
                    ELSE 'article' END AS doc_type
        FROM documents ORDER BY doc_id
    """,
    "q15_props_map": """
        WITH per_type AS (
            SELECT user_id, event_type AS k, count(*) AS v
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               array_to_string(
                   list_transform(list_sort(list({'k': k, 'v': v})),
                                  e -> e.k || ':' || e.v), '|') AS entries
        FROM per_type GROUP BY user_id ORDER BY user_id
    """,
    "q16_salted_stats": """
        SELECT event_type, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q17_set_ops": """
        SELECT custkey FROM (
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        )
        EXCEPT ALL
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        ORDER BY custkey
    """,
    "q18_percent_escape": """
        SELECT p_partkey,
               replace(replace(p_name, '%', '%25'), ',', '%2C') AS escaped,
               replace(replace(replace(replace(p_name, '%', '%25'), ',', '%2C'),
                       '%2C', ','), '%25', '%') AS roundtrip
        FROM part ORDER BY p_partkey
    """,
    "q19_asof_join": """
        WITH errors AS (
            SELECT event_id AS error_id, user_id, ts FROM events
            WHERE event_type = 'error'
        ), clicks AS (
            SELECT event_id AS click_id, user_id, ts FROM events
            WHERE event_type = 'click'
        )
        SELECT e.error_id, e.user_id, c.click_id
        FROM errors e ASOF JOIN clicks c
          ON e.user_id = c.user_id AND e.ts >= c.ts
        ORDER BY error_id
    """,
    "q20_pivot": """
        SELECT c_nationkey,
               count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
               count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
               count(*) FILTER (o_orderpriority = '5-LOW') AS low
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "q21_cube": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q") and name[1:3].isdigit()
}

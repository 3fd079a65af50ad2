"""Relational operator coverage queries (SURVEY.md §2 → testdata tables).

Each function takes (spark, sf_dir) and returns a DataFrame; each has a
DuckDB oracle in ORACLES with identical column names. These exercise
the operator spine the KG pipeline is built from: partial+final
aggregation (reference combiners, e.g. RedirectStep.java:73-74),
broadcast lookup joins (LMDB caches, PagesByTitleCache.java:35-67),
semi/anti membership joins (LabelCache.java:64-78,
LabelSensesStep.java:380-382), sorted-merge full-outer
(DumpExtractor.java:701-853), adjacency builds with deterministic caps
(PageLinkSummaryStep.java:78-119), top-1-per-group "isPrimary"
(PageLabelStep.java:95-112), and iterative transitive closure
(RedirectCache.java:156-198).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from grisp_spark.sources.testdata import load_table


# --- A-family: aggregation with partial (map-side) combine ----------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: groupBy 2 keys, 8 aggregates. Catalyst plans
    partial hash-agg before the shuffle — the built-in equivalent of the
    reference's combiner-as-reducer (LabelSensesStep.java:70-71)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q02_global_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 analogue: per-type counts + global max timestamp
    (PageStep.java:90-103; lastEdit max DumpExtractor.java:979-1011)."""
    ev = load_table(spark, sf_dir, "events")
    # sum over DECIMAL(18,2): exact and associative, so the total is
    # bit-identical across engines regardless of partial-agg order
    # (a double sum differs ~1e-15 between Spark and the oracle)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.max("ts").alias("last_ts"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


# --- J-family: joins -------------------------------------------------------

def q03_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 analogue: fact⨝small-dim as an explicit broadcast hash join
    (the reference's LMDB title lookup, PagesByTitleCache.java:95-165).
    nation+region stay on every executor; no shuffle of lineitem for
    the dims."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 analogue: membership semi-join (ngram ∈ label dictionary,
    LabelOccurrencesStep.java:190). Customers with ≥1 urgent order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter anti-join analogue (unresolvable link targets logged
    at LabelSensesStep.java:380-382): customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


def q06_full_outer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 analogue: the reference's sorted full-outer merge of two label
    stat files (DumpExtractor.java:701-853) — here, per-part link-side
    stats (lineitem) merged with text-side stats (part catalog), nulls
    coalesced to 0 exactly like the A-only/B-only merge branches."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    link_stats = li.groupBy("l_partkey").agg(
        F.count("*").alias("link_occ"),
        F.countDistinct("l_orderkey").alias("link_doc"),
    )
    text_stats = part.groupBy("p_partkey").agg(
        F.count("*").alias("text_occ"),
        F.max("p_retailprice").alias("price"),
    )
    merged = link_stats.join(
        text_stats, link_stats.l_partkey == text_stats.p_partkey, "full_outer"
    )
    return merged.select(
        F.coalesce("l_partkey", "p_partkey").alias("partkey"),
        F.coalesce("link_occ", F.lit(0)).alias("link_occ"),
        F.coalesce("link_doc", F.lit(0)).alias("link_doc"),
        F.coalesce("text_occ", F.lit(0)).alias("text_occ"),
        F.coalesce("price", F.lit(0.0)).alias("price"),
    ).orderBy("partkey")


# --- W/O-family: windows, top-k, ordering ---------------------------------

def q07_is_primary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 "isPrimary" analogue (PageLabelStep.java:95-112 +
    DumpExtractor.java:930-944 ordering): top-3 orders per customer by
    (totalprice desc, orderkey asc) — fully deterministic tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
        .orderBy("o_custkey", "rank")
    )


def q08_adjacency_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 out-adjacency analogue (PageLinkSummaryStep.java:78-119):
    per-user sorted distinct event-type list with a deterministic cap
    (the reference caps at 50,000 by arrival; we cap by sort order —
    documented deviation, SURVEY.md §7)."""
    ev = load_table(spark, sf_dir, "events")
    # one collect_set feeds both the capped list and the degree —
    # a separate countDistinct would force a second shuffle (Spark
    # expands distinct aggregates into a two-exchange plan).
    # out_adj is emitted '|'-joined: the driver's canonicalizer can't
    # hash array cells, so driver-facing queries keep scalar columns.
    return (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("adj"))
        .select(
            "user_id",
            F.array_join(F.slice("adj", 1, 3), "|").alias("out_adj"),
            F.size("adj").cast("long").alias("degree"),
        )
        .orderBy("user_id")
    )


def q09_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 turn-window analogue: sessionize events per user on a
    30-minute gap (lag + cumulative sum over an ordered window — the
    same machinery as per-conv turn windows for triple extraction)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in parquet; session TZ is pinned UTC so the
    # cast to TIMESTAMP is value-identical, and unix_micros gives exact
    # integer microseconds (no float epoch drift vs the oracle).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.when(us - F.lag(us).over(w) > 1800 * 1_000_000, 1).otherwise(0)
    sess = ev.withColumn("new_sess", gap).withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
        .orderBy("user_id", "session_id")
    )


# --- Set ops / distinct -----------------------------------------------------

def q10_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/U2 distinct out-link analogue (LabelSensesStep.java:377-378):
    distinct (user, event_type) pairs."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct().orderBy("user_id", "event_type")


# --- F/C-family: scalar functions ------------------------------------------

def q11_title_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 normaliseTitle semantics (util/Util.java:11-26): first char
    uppercased, '_'→' ', strip '#fragment', trim — applied to part
    names, pure JVM-side expressions (no UDF)."""
    part = load_table(spark, sf_dir, "part")
    raw = F.trim(F.split(F.translate(F.col("p_name"), "_", " "), "#").getItem(0))
    norm = F.when(F.length(raw) > 0, F.concat(F.upper(F.substring(raw, 1, 1)), F.expr("substring(raw, 2)"))).otherwise(raw)
    return (
        part.withColumn("raw", raw)
        .withColumn("norm_name", norm)
        .select("p_partkey", "norm_name")
        .orderBy("p_partkey")
    )


def q12_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 JSON field extraction analogue (ProcessWikiData.java:149-154
    findPath("id")): pull props.k from the events JSON column, aggregate
    by it."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.avg("value").alias("avg_value"))
        .orderBy("k")
    )


# --- J3: iterative transitive closure ---------------------------------------

def q13_redirect_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 redirect-chain resolution (RedirectCache.java:156-198) as
    pointer-jumping over a derived edge table: supplier s points to
    supplier (s+1) within each nation (chains), resolved to each
    chain's terminal node by operators/closure.resolve_chains — the
    fixpoint-probed O(log L) doubling loop (a fixed round count would
    silently truncate chains longer than 2^rounds at larger SFs)."""
    from grisp_spark.operators.closure import resolve_chains

    sup = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_suppkey")
    edges = (
        sup.withColumn("nxt", F.lead("s_suppkey").over(w))
        .select(
            F.col("s_suppkey").alias("src"),
            F.coalesce("nxt", "s_suppkey").alias("dst"),
        )
    )
    return resolve_chains(edges).orderBy("src")


ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity) AS avg_qty,
               avg(l_extendedprice) AS avg_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q02_global_counters": """
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               max(ts) AS last_ts,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q03_broadcast_dim_join": """
        SELECT r_name, n_name,
               sum(o_totalprice) AS revenue, count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "q04_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    "q05_anti_join": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "q06_full_outer_merge": """
        WITH link_stats AS (
            SELECT l_partkey, count(*) AS link_occ,
                   count(DISTINCT l_orderkey) AS link_doc
            FROM lineitem GROUP BY l_partkey
        ), text_stats AS (
            SELECT p_partkey, count(*) AS text_occ,
                   max(p_retailprice) AS price
            FROM part GROUP BY p_partkey
        )
        SELECT coalesce(l_partkey, p_partkey) AS partkey,
               coalesce(link_occ, 0) AS link_occ,
               coalesce(link_doc, 0) AS link_doc,
               coalesce(text_occ, 0) AS text_occ,
               coalesce(price, 0.0) AS price
        FROM link_stats FULL OUTER JOIN text_stats ON l_partkey = p_partkey
        ORDER BY partkey
    """,
    "q07_is_primary_topk": """
        SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
            FROM orders
        ) WHERE rank <= 3 ORDER BY o_custkey, rank
    """,
    "q08_adjacency_out": """
        SELECT user_id,
               array_to_string(list_sort(list_distinct(list(event_type)))[1:3], '|')
                 AS out_adj,
               count(DISTINCT event_type) AS degree
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q09_sessionize": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        -- CAST: DuckDB's windowed sum() yields HUGEINT (pandas float64)
        -- while Spark yields bigint; same values, different hash.
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               min(ts) AS sess_start, max(ts) AS sess_end
        FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    "q10_distinct_pairs": """
        SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
    """,
    "q11_title_normalize": """
        SELECT p_partkey,
               CASE WHEN length(raw) > 0
                    THEN upper(raw[1]) || raw[2:]
                    ELSE raw END AS norm_name
        FROM (SELECT p_partkey,
                     trim(string_split(replace(p_name, '_', ' '), '#')[1]) AS raw
              FROM part)
        ORDER BY p_partkey
    """,
    "q12_json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               count(*) AS n, avg(value) AS avg_value
        FROM events GROUP BY k ORDER BY k
    """,
    "q13_redirect_closure": """
        WITH RECURSIVE edges AS (
            SELECT s_suppkey AS src,
                   coalesce(lead(s_suppkey) OVER (PARTITION BY s_nationkey
                                                  ORDER BY s_suppkey), s_suppkey) AS dst
            FROM supplier
        ),
        closure AS (
            SELECT src, dst FROM edges WHERE src = dst
            UNION ALL
            SELECT e.src, c.dst FROM edges e JOIN closure c ON e.dst = c.src
              WHERE e.src <> e.dst
        )
        SELECT src, dst AS terminal FROM closure ORDER BY src
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q") and name[1].isdigit()
}

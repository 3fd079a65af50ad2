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
    """Approximate sketches (HLL distinct + approx quantile). Sketch
    VALUES are engine-specific, so the checkable contract is: emit the
    exact counterparts plus a boolean per sketch asserting
    |approx − exact| / exact within tolerance — DuckDB verifies the
    exact columns and expects the booleans to be true. HLL's default
    rsd=0.05 is a ~1-sigma STANDARD ERROR, not a bound, so the HLL
    tolerance is 3×rsd (0.15, ~99.7% of seeds/scales); the quantile
    sketch at its default accuracy is deterministic and far tighter,
    so it keeps 0.05."""
    li = load_table(spark, sf_dir, "lineitem")
    hll_tol = 0.15  # 3x the default rsd of approx_count_distinct
    tol = 0.05
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_am"),
        F.percentile("l_extendedprice", 0.5).alias("_em"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n",
        (
            F.abs(F.col("_ap") - F.col("exact_parts"))
            <= hll_tol * F.col("exact_parts")
        ).alias("parts_within_tol"),
        (F.abs(F.col("_am") - F.col("_em")) <= tol * F.abs(F.col("_em"))).alias(
            "median_within_tol"
        ),
    ).orderBy("l_returnflag")


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


def q26_wikidata_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point 2 end-to-end (ProcessWikiData.java:471-487): a
    wikidata JSON dump + per-language page_props INSERT dumps are
    synthesized deterministically from the customer table, parsed by
    the real source scanners (sources/sqldump), and accumulated into
    the per-Q-id {lang: page_id} map. P-ids, non-wikibase_item props,
    and Q-ids absent from the dump all exercise the filters; the map
    is emitted '|'-flattened for the driver canon. The oracle computes
    the expected mapping directly from the base table — so the string
    parse → filter → join → map pipeline is what's being checked."""
    from grisp_spark.kg import backbone

    idc = F.col("c_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey").filter(idc <= 500)
    prefix = F.when(idc % 10 == 0, F.lit("P")).otherwise(F.lit("Q"))
    json_lines = cust.select(
        F.concat(
            F.lit('{"id":"'), prefix, idc.cast("string"), F.lit('","type":"item"}')
        ).alias("value")
    )
    en_lines = cust.filter(idc % 3 != 0).select(
        F.concat(
            F.lit("INSERT INTO `page_props` VALUES ("),
            idc.cast("string"),
            F.lit(",'wikibase_item','Q"),
            idc.cast("string"),
            F.lit("',NULL);"),
        ).alias("value")
    )
    decoys = cust.filter(idc % 5 == 0).select(
        F.concat(
            F.lit("INSERT INTO `page_props` VALUES ("),
            idc.cast("string"),
            F.lit(",'page_image','img.png',0.5);"),
        ).alias("value")
    )
    fr_lines = cust.filter(idc % 2 == 0).select(
        F.concat(
            F.lit("INSERT INTO `page_props` VALUES ("),
            (idc + 100000).cast("string"),
            F.lit(",'wikibase_item','Q"),
            idc.cast("string"),
            F.lit("',NULL);"),
        ).alias("value")
    )
    df = backbone.wikidata_backbone(
        json_lines, {"en": en_lines.unionByName(decoys), "fr": fr_lines}
    )
    return df.select(
        "qid",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries("mapping"),
                    lambda e: F.concat_ws(":", e.key, e.value.cast("string")),
                )
            ),
            "|",
        ).alias("mapping"),
    ).orderBy("qid")


def q27_translations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point 3 end-to-end (ProcessTranslation.java:310-331):
    langlinks INSERT dumps synthesized from customer, parsed, language-
    whitelisted ('xx' rows dropped), '%'/',' titles percent-escaped
    (C8), accumulated into the per-page {lang: title} map, flattened
    for the driver canon."""
    from grisp_spark.kg import backbone

    idc = F.col("c_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name").filter(
        idc <= 500
    )

    def line(lang: str, title_col, pid_col):
        return F.concat(
            F.lit("INSERT INTO `langlinks` VALUES ("),
            pid_col.cast("string"),
            F.lit(f",'{lang}','"),
            title_col,
            F.lit("');"),
        ).alias("value")

    fr = cust.select(line("fr", F.concat(F.col("c_name"), F.lit(",fr%")), idc))
    de = cust.filter(idc % 2 == 0).select(line("de", F.col("c_name"), idc))
    xx = cust.filter(idc % 3 == 0).select(line("xx", F.lit("dropped"), idc))
    lines = fr.unionByName(de).unionByName(xx)
    df = backbone.translations(lines)
    return df.select(
        "page_id",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries("translations"),
                    lambda e: F.concat_ws(":", e.key, e.value),
                )
            ),
            "|",
        ).alias("translations"),
    ).orderBy("page_id")


def q28_xml_page_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/F1/F2/C3/S6 end-to-end with an oracle: a MediaWiki-shaped
    XML dump is synthesized deterministically from the part table,
    written to scratch, and parsed by the real tag-delimited scan
    (sources/xml.page_records lineSep split → regex fields → namespace
    filter → mega-record guard) + page-type classification. The
    DuckDB oracle computes the expected rows directly from part —
    so the XML round-trip is what's checked. partkey 1 gets a >100k
    char body and must be dropped by the S6 guard."""
    import hashlib
    import os

    from grisp_spark.sources import xml as xml_src

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    rows = sorted(
        (int(r.p_partkey), r.p_name) for r in part.collect()
    )
    blocks = []
    for k, name in rows:
        ns = 14 if k % 7 == 0 else 0
        title = (f"Category:{name}" if ns == 14 else name)
        redirect = f'  <redirect title="T{k}" />\n' if k % 5 == 0 else ""
        body = "x" * 100_001 if k == 1 else (
            "{{disambiguation}} stub" if k % 11 == 0 else f"body of {name}"
        )
        ts = f"2016-12-06T03:46:{k % 60:02d}Z"
        blocks.append(
            "<page>\n"
            f"  <title>{title}</title>\n"
            f"  <ns>{ns}</ns>\n"
            f"  <id>{k}</id>\n"
            f"{redirect}"
            f"  <revision><timestamp>{ts}</timestamp>\n"
            f'  <text xml:space="preserve">{body}</text></revision>\n'
            "</page>"
        )
    content = "<mediawiki>\n" + "\n".join(blocks) + "\n</mediawiki>"
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data",
        f"q28_dump_{tag}.xml",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # atomic replace: concurrent sessions share this scratch path, and
    # a plain truncate-write could expose a half-written dump to the
    # other session's lazy scan (content is deterministic, so whoever
    # replaces last writes identical bytes)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, path)
    pages = xml_src.classify_pages(xml_src.page_records(spark, path))
    return pages.select(
        "page_id", "title", "ns", "page_type", "ts"
    ).orderBy("page_id")


def q29_tql_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 TQL (N-Quads) scan with an oracle: quad lines synthesized
    from the supplier table — one URI-object triple and one quoted-
    literal triple per supplier, plus malformed lines that the grammar
    must drop — parsed by the real sources/sqldump.parse_tql regex;
    the oracle computes the expected quads directly from supplier."""
    from grisp_spark.sources import sqldump

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    subj = F.concat(F.lit("<http://kb/s"), F.col("s_suppkey").cast("string"), F.lit(">"))
    uri = sup.select(
        F.concat(
            subj,
            F.lit(" <http://kb/prop/nation> <http://kb/n"),
            F.col("s_nationkey").cast("string"),
            F.lit("> <http://g> ."),
        ).alias("value")
    )
    lit = sup.select(
        F.concat(
            subj,
            F.lit(' <http://kb/prop/name> "'),
            F.col("s_name"),
            F.lit('" <http://g> .'),
        ).alias("value")
    )
    bad = sup.filter(F.col("s_suppkey") % 10 == 0).select(
        F.lit("malformed line with no quad structure").alias("value")
    )
    lines = uri.unionByName(lit).unionByName(bad)
    return sqldump.parse_tql(lines).orderBy("subject", "property", "object")


def q30_wiki_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 wiki-link parse with an oracle: markup synthesized from the
    part table (one anchored main-namespace link + one Category link
    per page) parsed by the real sources/xml.parse_links grammar
    (namespace resolution, anchor/section split); the oracle computes
    the expected link rows directly from part."""
    from grisp_spark.sources import xml as xml_src

    part = load_table(spark, sf_dir, "part")
    pages = part.select(
        F.col("p_partkey").alias("page_id"),
        F.concat(
            F.lit("See [["),
            F.col("p_name"),
            F.lit("|ref]] and [[Category:"),
            F.col("p_type"),
            F.lit("]]."),
        ).alias("text"),
    )
    return xml_src.parse_links(pages).orderBy(
        "page_id", "target_ns", "target_title"
    )


def q31_disambig_senses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disambiguation sense extraction with an oracle: one synthetic
    disambiguation page per region whose '*' list lines carry the
    region's nations (plus non-list noise lines the extractor must
    ignore), parsed by sources/xml.parse_disambig_links; the oracle is
    the nation table itself."""
    from grisp_spark.sources import xml as xml_src

    nat = load_table(spark, sf_dir, "nation")
    pages = (
        nat.groupBy("n_regionkey")
        .agg(
            F.concat(
                F.lit("'''Disambig''' page intro.\n"),
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.concat(F.lit("*[["), F.col("n_name"), F.lit("]] a nation"))
                        )
                    ),
                    "\n",
                ),
                F.lit("\n{{disambiguation}}"),
            ).alias("text")
        )
        .select(F.col("n_regionkey").cast("long").alias("page_id"), "text")
    )
    return xml_src.parse_disambig_links(pages).orderBy("page_id", "sense_title")


def q40_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category/page depth analogue (the reference's PageDepthSummary:
    distance from the root category) as level-synchronous BFS
    (operators/closure.bfs_depth) over a derived per-nation supplier
    tree: rank r (by suppkey within nation) parents to rank r//2, so
    depth = floor(log2 r) and the BFS converges in O(log n) rounds at
    every SF."""
    from grisp_spark.operators.closure import bfs_depth

    sup = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_suppkey")
    ranked = sup.select(
        "s_nationkey",
        F.col("s_suppkey").alias("id"),
        F.row_number().over(w).alias("r"),
    )
    parents = ranked.select(
        "s_nationkey", F.col("id").alias("src"), F.col("r").alias("pr")
    )
    edges = (
        ranked.filter(F.col("r") > 1)
        .withColumn("pr", (F.col("r") / 2).cast("int"))
        .join(parents, ["s_nationkey", "pr"])
        .select("src", F.col("id").alias("dst"))
    )
    roots = ranked.filter(F.col("r") == 1).select("id")
    return bfs_depth(edges, roots).orderBy("id")


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
    "q28_xml_page_scan": """
        SELECT p_partkey AS page_id,
               CASE WHEN p_partkey % 7 = 0 THEN 'Category:' || p_name
                    ELSE p_name END AS title,
               CASE WHEN p_partkey % 7 = 0 THEN 14 ELSE 0 END AS ns,
               CASE WHEN p_partkey % 5 = 0 THEN 'redirect'
                    WHEN p_partkey % 7 = 0 THEN 'category'
                    WHEN p_partkey % 11 = 0 THEN 'disambiguation'
                    ELSE 'article' END AS page_type,
               TIMESTAMP '2016-12-06 03:46:00'
                 + to_seconds(p_partkey % 60) AS ts
        FROM part
        WHERE p_partkey <> 1  -- mega-record dropped by the S6 guard
        ORDER BY page_id
    """,
    "q31_disambig_senses": """
        SELECT CAST(n_regionkey AS BIGINT) AS page_id, n_name AS sense_title
        FROM nation ORDER BY page_id, sense_title
    """,
    "q30_wiki_links": """
        SELECT * FROM (
            SELECT p_partkey AS page_id, 0 AS target_ns,
                   p_name AS target_title, '' AS section, 'ref' AS anchor
            FROM part
            UNION ALL
            SELECT p_partkey, 14, p_type, '', p_type
            FROM part
        ) ORDER BY page_id, target_ns, target_title
    """,
    "q29_tql_scan": """
        SELECT * FROM (
            SELECT 'http://kb/s' || CAST(s_suppkey AS VARCHAR) AS subject,
                   'http://kb/prop/nation' AS property,
                   'http://kb/n' || CAST(s_nationkey AS VARCHAR) AS object,
                   'http://g' AS graph
            FROM supplier
            UNION ALL
            SELECT 'http://kb/s' || CAST(s_suppkey AS VARCHAR),
                   'http://kb/prop/name', s_name, 'http://g'
            FROM supplier
        ) ORDER BY subject, property, object
    """,
    "q26_wikidata_backbone": """
        WITH base AS (SELECT c_custkey AS id FROM customer WHERE c_custkey <= 500),
        qids AS (
            SELECT 'Q' || CAST(id AS VARCHAR) AS qid FROM base WHERE id % 10 <> 0
        ),
        props AS (
            SELECT 'Q' || CAST(id AS VARCHAR) AS qid, 'en' AS lang,
                   id AS page_id
            FROM base WHERE id % 3 <> 0
            UNION ALL
            SELECT 'Q' || CAST(id AS VARCHAR), 'fr', id + 100000
            FROM base WHERE id % 2 = 0
        ),
        j AS (SELECT q.qid, p.lang, p.page_id
              FROM qids q LEFT JOIN props p USING (qid))
        SELECT qid,
               coalesce(array_to_string(
                   list_sort(list_filter(
                       list(lang || ':' || CAST(page_id AS VARCHAR)),
                       x -> x IS NOT NULL)), '|'), '') AS mapping
        FROM j GROUP BY qid ORDER BY qid
    """,
    "q27_translations": """
        WITH base AS (
            SELECT c_custkey AS id, c_name FROM customer WHERE c_custkey <= 500
        ),
        rows_ AS (
            SELECT id AS page_id, 'fr' AS lang,
                   replace(replace(c_name || ',fr%', '%', '%25'), ',', '%2C') AS title
            FROM base
            UNION ALL
            SELECT id, 'de', replace(replace(c_name, '%', '%25'), ',', '%2C')
            FROM base WHERE id % 2 = 0
        )
        SELECT page_id,
               array_to_string(list_sort(list(lang || ':' || title)), '|')
                 AS translations
        FROM rows_ GROUP BY page_id ORDER BY page_id
    """,
    "q24_approx_sketches": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               count(*) AS n,
               true AS parts_within_tol,
               true AS median_within_tol
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q25_exact_percentiles": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q40_tree_depth": """
        WITH RECURSIVE ranked AS (
            SELECT s_nationkey, s_suppkey AS id,
                   row_number() OVER (PARTITION BY s_nationkey
                                      ORDER BY s_suppkey) AS r
            FROM supplier
        ),
        e AS (
            SELECT p.id AS src, c.id AS dst
            FROM ranked c JOIN ranked p
              ON c.s_nationkey = p.s_nationkey
             AND p.r = c.r // 2 AND c.r > 1
        ),
        walk(id, depth) AS (
            SELECT id, 0 FROM ranked WHERE r = 1
            UNION ALL
            SELECT e.dst, w.depth + 1 FROM walk w JOIN e ON e.src = w.id
        )
        SELECT id, CAST(depth AS INTEGER) AS depth FROM walk ORDER BY id
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q") and name[1:3].isdigit()
}


def q41_timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: events bucketed
    to the hour per event_type with count / exact sum / min / max and
    deterministic first/last values (ordered by (ts, event_id) —
    struct-min/max, no nondeterministic first()/min_by ties). The
    shape TimescaleDB materializes for rollup views: ONE partial-agg
    shuffle on (event_type, bucket); at 100 TB the bucket column also
    serves as the write partition key.

    value is DOUBLE in the source; sums accumulate in DECIMAL(18,2)
    (the generator writes 2-decimal values, so the cast is lossless)
    and convert to DOUBLE once at the end — exact and order-free on
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    dec = F.col("value").cast("decimal(18,2)")
    ordkey = F.struct(ts.alias("ts"), F.col("event_id").alias("event_id"),
                      F.col("value").alias("value"))
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", ts).alias("bucket"),
            "value", "event_id", ts.alias("ts_c"), dec.alias("dec"),
            ordkey.alias("ok"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("dec").cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.min("ok").getField("value").alias("first_value"),
            F.max("ok").getField("value").alias("last_value"),
        )
        .orderBy("event_type", "bucket")
    )


ORACLES["q41_timeseries_rollup"] = """
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, ts,
               event_id, value,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rf,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rl
        FROM events
    )
    SELECT event_type, bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           max(CASE WHEN rf = 1 THEN value END) AS first_value,
           max(CASE WHEN rl = 1 THEN value END) AS last_value
    FROM e GROUP BY event_type, bucket
    ORDER BY event_type, bucket
"""
QUERIES["q41_timeseries_rollup"] = q41_timeseries_rollup


def q47_repair_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 driver row (VERDICT r6 #6): sources/sqldump.
    repair_truncated_ids — the corrupted-pageId repair of
    ProcessWikiData.java:261-289 (a dump tuple that lost the leading
    digit of its id is repaired from its predecessor's) — previously
    certified by pytest only. A deterministic corruption is
    synthesized from the orders table (every 7th orderkey loses its
    leading digit), the rows are split into contiguous 'dump file'
    groups (``o_orderkey div 8192``) so the inherently-sequential
    lag-repair parallelizes across groups exactly like the operator's
    ``partition_cols`` per-file path (no single-partition window),
    and DuckDB replays the same lag() semantics."""
    from grisp_spark.sources import sqldump

    orders = load_table(spark, sf_dir, "orders")
    raw = F.when(
        (F.col("o_orderkey") % 7 == 0)
        & (F.length(F.col("o_orderkey").cast("string")) > 1),
        F.expr("substring(cast(o_orderkey as string), 2)").cast("long"),
    ).otherwise(F.col("o_orderkey"))
    corrupted = orders.select(
        F.col("o_orderkey").alias("seq"),
        F.expr("o_orderkey div 8192").alias("grp"),
        raw.alias("raw_id"),
        raw.alias("page_id"),
    )
    repaired = sqldump.repair_truncated_ids(
        corrupted, id_col="page_id", order_col="seq", partition_cols=["grp"]
    )
    return repaired.select(
        "grp", "seq", "raw_id", F.col("page_id").alias("repaired_id")
    ).orderBy("seq")


ORACLES["q47_repair_ids"] = """
    WITH src AS (
        SELECT o_orderkey AS seq,
               o_orderkey // 8192 AS grp,
               CASE WHEN o_orderkey % 7 = 0
                     AND len(CAST(o_orderkey AS VARCHAR)) > 1
                    THEN CAST(CAST(o_orderkey AS VARCHAR)[2:] AS BIGINT)
                    ELSE o_orderkey END AS raw_id
        FROM orders
    ),
    lagged AS (
        SELECT seq, grp, raw_id,
               lag(CAST(raw_id AS VARCHAR))
                   OVER (PARTITION BY grp ORDER BY seq) AS prev
        FROM src
    )
    SELECT grp, seq, raw_id,
           CASE WHEN prev IS NOT NULL
                 AND len(CAST(raw_id AS VARCHAR)) < len(prev)
                 AND CAST(prev[1:1] || CAST(raw_id AS VARCHAR) AS BIGINT)
                     > raw_id
                THEN CAST(prev[1:1] || CAST(raw_id AS VARCHAR) AS BIGINT)
                ELSE raw_id END AS repaired_id
    FROM lagged ORDER BY seq
"""
QUERIES["q47_repair_ids"] = q47_repair_ids

"""Graph materialization — grisp steps 6-7 analogue.

Produces the partitioned output tables: entity/edge tables, in/out
adjacency summaries with deterministic caps
(PageLinkSummaryStep.java:78-119, cap 112-114), the entity→labels
inversion (PageLabelStep.java:80-134, cap 127-129, isPrimary 95-112),
and global counters (PageStep.java:90-103, stats.csv
DumpExtractor.java:855-871).

Caps here are deterministic (by sort order) instead of the
reference's arrival order — documented deviation (SURVEY.md §7).
In production these write as Iceberg tables partitioned by
bucket(entity_id); parquet + an explicit bucket column is the sandbox
stand-in (sources/iceberg.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from grisp_spark.kg.spec import MAX_LABELS_PER_ENTITY, MAX_LINKS_PER_NODE


def entity_edges(triples: DataFrame) -> DataFrame:
    """Entity↔entity edges from co-occurrence triples, distinct,
    typed."""
    return (
        triples.filter(F.col("pred") == "co_occurs_with")
        .select(
            F.col("subj").alias("src"),
            F.col("obj").cast("long").alias("dst"),
            F.lit("co_occurs").alias("edge_type"),
        )
        .distinct()
    )


def adjacency(edges: DataFrame, cap: int = MAX_LINKS_PER_NODE) -> DataFrame:
    """Out- and in-adjacency in one pass via a direction explode (the
    reference's dual emit under (id, isOut), PageLinkSummaryStep.java:92-98),
    sorted lists, capped deterministically."""
    dual = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("id"), F.col("dst").alias("nbr"), F.lit(True).alias("is_out")),
                F.struct(F.col("dst").alias("id"), F.col("src").alias("nbr"), F.lit(False).alias("is_out")),
            )
        ).alias("e")
    ).select("e.id", "e.nbr", "e.is_out")
    # single collect_set (one shuffle); degree derived from the set —
    # countDistinct alongside would double the exchanges
    return (
        dual.groupBy("id", "is_out")
        .agg(F.array_sort(F.collect_set("nbr")).alias("adj"))
        .select(
            "id",
            "is_out",
            F.slice("adj", 1, cap).alias("neighbors"),
            F.size("adj").cast("long").alias("degree"),
        )
    )


def entity_labels(label_stats: DataFrame, cap: int = MAX_LABELS_PER_ENTITY) -> DataFrame:
    """A7 inversion: per entity, its labels ordered by
    (link_occ desc, link_doc desc, label asc), capped; isPrimary marks
    the label whose top sense is this entity (W1,
    PageLabelStep.java:95-112)."""
    w_label = W.partitionBy("label").orderBy(
        F.col("link_occ").desc(), F.col("link_doc").desc(), F.col("entity_id").asc()
    )
    flagged = label_stats.withColumn(
        "is_primary", F.row_number().over(w_label) == 1
    )
    w_ent = W.partitionBy("entity_id").orderBy(
        F.col("link_occ").desc(), F.col("link_doc").desc(), F.col("label").asc()
    )
    return (
        flagged.withColumn("rn", F.row_number().over(w_ent))
        .filter(F.col("rn") <= cap)
        .select("entity_id", "label", "link_occ", "link_doc", "text_occ", "text_doc", "is_primary", "rn")
    )


def global_counters(entities: DataFrame, conversations: DataFrame) -> DataFrame:
    """stats.csv analogue: (name, value) rows — entity counts per type
    + corpus extent."""
    type_counts = entities.groupBy("entity_type").count().select(
        F.concat(F.col("entity_type"), F.lit("_count")).alias("name"),
        F.col("count").cast("string").alias("value"),
    )
    # two-level: per-conv partials first (no Expand doubling the full
    # turn stream for the distinct count; max-of-max is exact)
    corpus = (
        conversations.groupBy("conv_id")
        .agg(F.count("*").alias("_n"), F.max("ts").alias("_ts"))
        .agg(
            F.count("*").alias("conversation_count"),
            # sum over zero groups is NULL; the counter contract is 0
            F.coalesce(F.sum("_n"), F.lit(0)).alias("turn_count"),
            F.max("_ts").cast("string").alias("last_ts"),
        )
    )
    corpus_long = corpus.selectExpr(
        "stack(3, 'conversation_count', cast(conversation_count as string), "
        "'turn_count', cast(turn_count as string), 'last_ts', last_ts) as (name, value)"
    )
    return type_counts.unionByName(corpus_long)

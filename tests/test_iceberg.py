"""Iceberg source/sink contract: the sandbox has no Iceberg runtime,
so the capability probe must say so, iceberg: locations must fail
loudly, and the parquet fallback must round-trip with partitioning."""

import os

import pytest

from grisp_spark.sources import iceberg


def test_capability_probe_false_here(spark):
    assert iceberg.iceberg_available(spark) is False


def test_iceberg_location_fails_loudly(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        iceberg.read_conversations(spark, "iceberg:kg.db.conversations")


def test_parquet_fallback_roundtrip_partitioned(spark):
    out = "/root/repo/.data/iceberg_fallback"
    df = spark.createDataFrame(
        [("c1", 0, "user"), ("c1", 1, "assistant"), ("c2", 0, "user")],
        "conv_id string, turn_idx int, role string",
    )
    iceberg.write_table(df, out, partition_by=["role"])
    # partition directories exist (the layout bucketing relies on)
    assert os.path.isdir(os.path.join(out, "role=user"))
    back = iceberg.read_conversations(spark, out)
    assert back.count() == 3
    assert set(back.columns) == {"conv_id", "turn_idx", "role"}

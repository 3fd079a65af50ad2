"""_dense_ids: distributed zipWithIndex (+ in-pass group-min) vs the
window shapes it replaced.

The ranking contract — global 1-based rank by order_cols, rows unique
on the keys — is certified every round through the KB-bootstrap
oracles (q37-q39/q42-q45 replay `row_number() OVER (ORDER BY ...)` in
DuckDB). These tests pin the two parts the oracles can't isolate:
bit-parity of the group_min fix-up against the window it replaced on
inputs BUILT to span range-partition boundaries, and the
single-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from grisp_spark.queries_kg import _dense_ids


def _window_reference(df, order_cols, out_col, gcol, mcol):
    """The shapes _dense_ids replaced: global row_number + min() over
    the group — kept as the semantic reference."""
    ranked = df.withColumn(
        out_col, F.row_number().over(W.orderBy(*order_cols)).cast("long")
    )
    return ranked.withColumn(mcol, F.min(out_col).over(W.partitionBy(gcol)))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_group_min_parity_groups_span_partitions(spark):
    # 20 labels x 1000 roles over 8 shuffle partitions (~2.5k rows
    # each): every range boundary cuts INSIDE a label group, so the
    # spill fix-up path runs for essentially every partition
    df = spark.range(20_000).select(
        F.lpad((F.col("id") / 1000).cast("int").cast("string"), 3, "0").alias(
            "label"
        ),
        F.lpad((F.col("id") % 1000).cast("string"), 4, "0").alias("role"),
    )
    got = _dense_ids(df, ["label", "role"], "eid", group_min=("label", "gmin"))
    exp = _window_reference(df, ["label", "role"], "eid", "label", "gmin")
    assert _rows(got) == _rows(exp)


def test_group_min_parity_group_swallows_whole_partitions(spark):
    # 2 labels x 10000 roles: each group covers SEVERAL whole range
    # partitions — the driver walk must carry the open group across
    # partitions whose first and last key are both the spilled key
    df = spark.range(20_000).select(
        F.when(F.col("id") < 10_000, F.lit("aaa")).otherwise(F.lit("zzz")).alias(
            "label"
        ),
        F.lpad((F.col("id") % 10_000).cast("string"), 5, "0").alias("role"),
    )
    got = _dense_ids(df, ["label", "role"], "eid", group_min=("label", "gmin"))
    exp = _window_reference(df, ["label", "role"], "eid", "label", "gmin")
    assert _rows(got) == _rows(exp)


def test_group_min_parity_every_row_its_own_group(spark):
    # degenerate: unique labels — every gmin equals the row's own id
    df = spark.range(5_000).select(
        F.md5(F.col("id").cast("string")).alias("label"),
        F.lit("x").alias("role"),
    )
    got = _dense_ids(df, ["label", "role"], "eid", group_min=("label", "gmin"))
    rows = got.select("eid", "gmin").collect()
    assert all(r["eid"] == r["gmin"] for r in rows)
    assert sorted(r["eid"] for r in rows) == list(range(1, 5_001))


def test_group_min_requires_major_key(spark):
    df = spark.range(10).select(
        F.col("id").cast("string").alias("a"), F.lit("b").alias("b")
    )
    try:
        _dense_ids(df, ["a", "b"], "eid", group_min=("b", "m"))
    except ValueError:
        pass
    else:
        raise AssertionError("minor-key group_min must be rejected")


def test_group_min_plan_is_single_shuffle(spark):
    # the whole point: ONE range exchange, no window, no re-shuffle
    # on _pid or the group key between the exchange and the output
    df = spark.range(20_000).select(
        F.lpad((F.col("id") / 1000).cast("int").cast("string"), 3, "0").alias(
            "label"
        ),
        F.lpad((F.col("id") % 1000).cast("string"), 4, "0").alias("role"),
    )
    got = _dense_ids(df, ["label", "role"], "eid", group_min=("label", "gmin"))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    # the InMemoryRelation rendering prints its cached child twice
    # (adaptive + original), so count the exchange by presence; the
    # no-hashpartitioning assert above is what pins "single shuffle"
    assert "Exchange rangepartitioning" in plan, plan
    assert "MapInPandas" in plan, plan


def test_group_min_null_keys_raise(spark):
    # ADVICE r7: the boundary-spill statistics (min/max/count of the
    # group key) ignore NULLs, so a null group could silently corrupt
    # min ids — group_min must fail loudly on any null key
    df = spark.range(1_000).select(
        F.when(F.col("id") % 100 != 0, F.lpad(F.col("id").cast("string"), 4, "0"))
        .alias("label"),
        F.lit("x").alias("role"),
    )
    try:
        _dense_ids(df, ["label", "role"], "eid", group_min=("label", "gmin"))
    except ValueError as e:
        assert "non-null" in str(e)
    else:
        raise AssertionError("null group keys must raise under group_min")
    # rank-only path (no group_min) still accepts nulls (nulls-first)
    got = _dense_ids(df, ["label", "role"], "eid")
    ranks = sorted(r["eid"] for r in got.collect())
    assert ranks == list(range(1, 1_001))

"""VERDICT r6 #5: prove the dense-id de-funnel's cost is a CONSTANT,
not corpus-scaled, by measuring the Δ between the shipped two-phase
assignment and the old single-partition-window shape at TWO corpus
sizes (sf0.01 and sf0.1 — a 10× corpus step). If the Δ stays flat
while the corpus term grows, the "constant, not corpus-scaled" claim
in queries_kg._dense_ids' docstring is empirical.

Protocol: one local[32] session (driver config), per SF × shape:
1 warm-up pass + 3 measured passes of ent.count() (the action that
forces the full dense-id assignment), fresh un-persisted frames each
pass so every pass pays the full plan. /proc/stat steal is sampled
around the whole experiment. Run on an otherwise idle box.

Usage: python scripts/dense_id_scale_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F


def _steal_ticks() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def _old_single_window(df, order_cols, out_col):
    """The pre-r6 shape: global row_number (Exchange SinglePartition).
    Kept here only as the A/B baseline — never ship this."""
    w = W.orderBy(*order_cols)
    return df.withColumn(out_col, F.row_number().over(w).cast("long"))


def _arrow_zip(df, order_cols, out_col):
    """Candidate r7 shape: SINGLE-shuffle zipWithIndex. The shipped
    two-phase shape pays a second full exchange — Catalyst cannot know
    rangepartitioning(order_cols) already clusters by _pid, so the
    ranking window inserts Exchange hashpartitioning(_pid). Here the
    within-partition rank comes from a stateful Arrow pass over the
    ALREADY range-partitioned, locally-sorted, persisted layout: a
    running counter seeded with the partition's cumulative offset.
    Ranks are identical (same total order, same offsets); the second
    shuffle and the window sort disappear."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    base = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    offs, acc = {}, 0
    for r in base.groupBy("_pid").count().orderBy("_pid").collect():
        offs[int(r["_pid"])] = acc
        acc += int(r["count"])
    # StructType.add MUTATES (and returns) self — copying keeps the
    # input frame's cached schema intact
    schema = StructType(
        list(base.schema.fields) + [StructField(out_col, LongType())]
    )

    def assign(batches):
        pos = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pos is None:
                pos = offs[int(pdf["_pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[out_col] = np.arange(pos + 1, pos + len(pdf) + 1, dtype="int64")
            pos += len(pdf)
            yield pdf

    return base.mapInPandas(assign, schema).drop("_pid")


def _bootstrap_base(spark, sf_dir):
    """_centroid_corpus_kb's sense table up to (but excluding) the
    dense-id assignment — the exact frame _dense_ids receives."""
    from grisp_spark.kg.stats import occ_doc_agg
    from grisp_spark.queries_kg import MIN_OCC, _turn_tokens
    from grisp_spark.sources.testdata import derive_conversations

    conv = derive_conversations(spark, sf_dir)
    toks = _turn_tokens(conv).filter(F.length("token") >= 6)
    senses = occ_doc_agg(
        toks.select("token", "role", "conv_id"), ["token", "role"], "occ", "doc"
    )
    labs = (
        senses.groupBy("token")
        .agg(F.sum("occ").alias("tot"))
        .filter(F.col("tot") >= MIN_OCC)
        .select("token")
    )
    return senses.join(labs, "token")


def main() -> None:
    from grisp_spark.queries_kg import _dense_ids

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("dense-id-scale-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {
        "two_phase": lambda df: _dense_ids(df, ["token", "role"], "entity_id"),
        "single_window": lambda df: _old_single_window(
            df, ["token", "role"], "entity_id"
        ),
        "arrow_zip": lambda df: _arrow_zip(df, ["token", "role"], "entity_id"),
    }
    out: dict = {"passes": {}, "rows": {}}
    t0_steal = _steal_ticks()
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        key = os.path.basename(sf)
        out["rows"][key] = _bootstrap_base(spark, sf).count()  # warm the scans
        for shape, fn in shapes.items():
            times = []
            for i in range(4):  # pass 0 = warm-up, 1-3 measured
                df = fn(_bootstrap_base(spark, sf))
                t0 = time.monotonic()
                # count() alone would let Catalyst PRUNE the ranking
                # window entirely — aggregate the id column so the
                # assignment actually runs
                row = df.agg(
                    F.count("*").alias("n"), F.max("entity_id").alias("mx")
                ).collect()[0]
                n, mx = row["n"], row["mx"]
                dt = time.monotonic() - t0
                assert mx == n, (mx, n)
                if i:
                    times.append(round(dt, 3))
                # _dense_ids persists internally; drop it so the next
                # pass pays the full cost again
                spark.catalog.clearCache()
                assert n == out["rows"][key], (n, out["rows"][key])
            out["passes"][f"{key}.{shape}"] = times
    # --- synthetic large-vocabulary leg -----------------------------------
    # The testdata bootstrap vocabulary is tiny (documents doesn't
    # scale with SF), so the corpus-scaling question is answered on a
    # synthetic sense table whose size DOES grow: unique md5 tokens ×
    # role, the exact (order_cols-unique) shape _dense_ids receives.
    # This is where the old single-window shape funnels the whole
    # table through one task and the range shape spreads it.
    for n in (2_000_000, 8_000_000):
        base = (
            spark.range(n)
            .select(
                F.md5(F.col("id").cast("string")).alias("token"),
                (F.col("id") % 3).cast("string").alias("role"),
            )
            .repartition(32)
        )
        for shape, fn in shapes.items():
            times = []
            for i in range(3):  # pass 0 = warm-up, 1-2 measured
                df = fn(base)
                t0 = time.monotonic()
                row = df.agg(
                    F.count("*").alias("n"), F.max("entity_id").alias("mx")
                ).collect()[0]
                dt = time.monotonic() - t0
                assert (row["n"], row["mx"]) == (n, n), row
                if i:
                    times.append(round(dt, 3))
                spark.catalog.clearCache()
            out["passes"][f"synth{n}.{shape}"] = times
    # --- group_min vs window-min on a multi-sense vocabulary --------------
    # 1M labels × 8 roles: min_eid (min id per label — the prior KB's
    # redirect-star target) via the pre-late-r7 min() window vs riding
    # the same Arrow pass (group_min). The window shape pays a full
    # hashpartitioning(label) exchange of the 8M-row table on top of
    # the rank pass; the in-pass shape pays two extra P-row stats jobs.
    n = 8_000_000
    base = (
        spark.range(n)
        .select(
            F.md5((F.col("id") / 8).cast("long").cast("string")).alias("label"),
            (F.col("id") % 8).cast("string").alias("role"),
        )
        .repartition(32)
    )
    min_shapes = {
        "window_min": lambda df: _dense_ids(df, ["label", "role"], "eid").withColumn(
            "min_eid", F.min("eid").over(W.partitionBy("label"))
        ),
        "inpass_min": lambda df: _dense_ids(
            df, ["label", "role"], "eid", group_min=("label", "min_eid")
        ),
    }
    sums = {}
    for shape, fn in min_shapes.items():
        times = []
        for i in range(3):  # pass 0 = warm-up, 1-2 measured
            df = fn(base)
            t0 = time.monotonic()
            row = df.agg(
                F.count("*").alias("n"),
                F.max("eid").alias("mx"),
                F.sum("min_eid").alias("sm"),
            ).collect()[0]
            dt = time.monotonic() - t0
            assert (row["n"], row["mx"]) == (n, n), row
            sums[shape] = int(row["sm"])
            if i:
                times.append(round(dt, 3))
            spark.catalog.clearCache()
        out["passes"][f"mineid{n}.{shape}"] = times
    # both shapes must produce the identical min_eid assignment
    assert sums["window_min"] == sums["inpass_min"], sums
    out["steal_cpu_s"] = round((_steal_ticks() - t0_steal) / 100.0, 1)
    for key in ("sf0.01", "sf0.1"):
        tp = min(out["passes"][f"{key}.two_phase"])
        sw = min(out["passes"][f"{key}.single_window"])
        out[f"delta_{key}"] = round(tp - sw, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-turn-window (subj, pred, obj) triple extraction.

Triple shape follows the reference's explicit triple extractor
(ProcessInfoBoxes.java:117-151: subject / property / value). Over
transcripts:

- (entity, 'mentioned_by', role)       — per turn with the entity linked
- (entity, 'used_with_tool', tool)     — tool turns only
- (a, 'co_occurs_with', b), a < b      — within the 2-turn window
  W_t = E_{t-1} ∪ E_t, emitted at turn t iff at least one side is in
  E_t (so a pair fully inside E_{t-1} was already emitted at t-1)

All JVM-side: collect_set per turn, lag window for E_{t-1}, double
explode for pairs — no Python in this stage. The lag window runs on
the (conv_id, turn_idx) layout the linking stage already produced, so
AQE sees a pre-shuffled input."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def extract_triples(conversations: DataFrame, linked: DataFrame) -> DataFrame:
    """conversations supplies the full turn spine (turns without
    mentions still advance the window — E_{t-1} of the next turn is
    empty); linked supplies per-turn canonical entity sets."""
    per_turn = linked.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.collect_set("canonical_id")).alias("ents")
    )
    spine = conversations.select("conv_id", "turn_idx", "role", "tool").distinct()
    turns = (
        spine.join(per_turn, ["conv_id", "turn_idx"], "left")
        .withColumn("ents", F.coalesce("ents", F.array().cast("array<bigint>")))
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    turns = turns.withColumn(
        "prev_ents",
        F.coalesce(F.lag("ents").over(w), F.array().cast("array<bigint>")),
    ).filter(F.size("ents") + F.size("prev_ents") > 0)
    # three triple branches consume this frame — persist it or the
    # full upstream (incl. the Arrow linking stage) recomputes 3x
    turns = turns.persist()

    cur = turns.select(
        "conv_id", "turn_idx", "role", "tool", F.explode("ents").alias("subj")
    )
    mentioned = cur.select(
        "conv_id", "turn_idx", "subj",
        F.lit("mentioned_by").alias("pred"), F.col("role").alias("obj"),
    )
    used_tool = cur.filter(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "subj",
        F.lit("used_with_tool").alias("pred"), F.col("tool").alias("obj"),
    )

    windowed = turns.withColumn(
        "window", F.array_sort(F.array_union("prev_ents", "ents"))
    )
    pairs = (
        windowed.select(
            "conv_id", "turn_idx", "ents",
            F.explode("window").alias("a"), F.col("window").alias("win"),
        )
        .select(
            "conv_id", "turn_idx", "ents", "a", F.explode("win").alias("b")
        )
        .filter(
            (F.col("a") < F.col("b"))
            & (F.array_contains("ents", F.col("a")) | F.array_contains("ents", F.col("b")))
        )
        .select(
            "conv_id", "turn_idx",
            F.col("a").alias("subj"),
            F.lit("co_occurs_with").alias("pred"),
            F.col("b").cast("string").alias("obj"),
        )
    )
    return mentioned.unionByName(used_tool).unionByName(pairs).distinct()

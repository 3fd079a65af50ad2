"""Benchmark runner.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the
KG-pipeline throughput job on a deterministic synthetic transcript
corpus, and prints ONE JSON line.

Scaling mode (``python bench.py --scaling``): runs the identical KG
job in two fresh subprocesses at local[8] and local[32] (the sandbox
stand-in for N vs 4N executors per BASELINE.md) and reports
turns/sec at both plus scaling efficiency; used to produce
BENCH/BASELINE.md.

``--job`` is the internal single-run entry used by the scaling mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "24000"))
BENCH_DATA = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".data", f"bench_conv_{BENCH_CONVS}"
)

HEADLINE = [
    "q01_pricing_summary",
    "q03_broadcast_dim_join",
    "q07_is_primary_topk",
    "q09_sessionize",
    "q13_redirect_closure",
    "dd03_minhash_lsh_pairs",
    "dd05_simhash",
    "dd06_embed_neardup",
    "ss01_cosine_topk",
    "ta04_fingerprint",
    "kg01_label_stats",
    "kg06_triples_flagship",
]


def ensure_bench_dataset() -> str:
    marker = os.path.join(BENCH_DATA, "conversations.parquet")
    if not os.path.exists(marker):
        from grisp_spark.kg.datagen import write_dataset

        write_dataset(BENCH_DATA, seed=42, n_convs=BENCH_CONVS)
    return BENCH_DATA


def _materialize(df) -> int:
    """Force full execution without driver collection."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_kg_job(spark, data_dir: str) -> tuple[int, float]:
    """The scaling-benchmark job: full linking + canonicalization +
    triple extraction (no disk checkpoints — pure compute+shuffle).
    Returns (n_turns, wall_sec)."""
    from pyspark.sql import functions as F

    from grisp_spark.kg import canonicalize, linking, triples as triples_mod

    conv = spark.read.parquet(os.path.join(data_dir, "conversations.parquet"))
    kb = {
        n: spark.read.parquet(os.path.join(data_dir, f"{n}.parquet"))
        for n in ("entities", "aliases", "label_stats")
    }
    n_turns = conv.count()
    t0 = time.monotonic()
    gaz_bc, evec_bc = linking.build_broadcasts(spark, kb)
    linked = linking.link_mentions(conv, gaz_bc, evec_bc)
    canon = canonicalize.canonical_map(kb["entities"])
    linked_c = canonicalize.rewrite_linked(linked, canon)
    trip = triples_mod.extract_triples(conv, linked_c)
    _materialize(trip)
    return n_turns, time.monotonic() - t0


def main_bench() -> None:
    from grisp_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "bench", cores=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.monotonic()
        _materialize(qs[name](spark, SF_DIR))
        dt = time.monotonic() - t0
        times[name] = round(dt, 3)
        total += dt

    data_dir = ensure_bench_dataset()
    n_turns, kg_sec = run_kg_job(spark, data_dir)
    times["kg_pipeline_synthetic"] = round(kg_sec, 3)
    total += kg_sec

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "kg_turns": n_turns,
                "kg_turns_per_sec": round(n_turns / kg_sec, 1),
            }
        )
    )


def main_job(cores: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from grisp_spark.session import get_spark

    spark = get_spark(
        f"kg_scaling_{cores}", cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    data_dir = ensure_bench_dataset()
    # warm-up pass (JIT, parquet footer cache), then the measured pass
    run_kg_job(spark, data_dir)
    n_turns, sec = run_kg_job(spark, data_dir)
    print(json.dumps({"cores": cores, "turns": n_turns, "sec": round(sec, 3),
                      "turns_per_sec": round(n_turns / sec, 1)}))


def main_scaling() -> None:
    ensure_bench_dataset()
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--job", str(cores)],
            capture_output=True, text=True, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
    r8, r32 = results[8], results[32]
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "kg_scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "unit": "ratio",
                "local8": r8,
                "local32": r32,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--job":
        main_job(int(sys.argv[2]))
    else:
        main_bench()

"""Extra benchmarks for the optimization rounds (bench.py is FROZEN
for driver measurement — guide §1.4 noop-sink isolation lives here).

Modes:
  python bench_extra.py                  # headline queries, N passes
                                         # each, per-pass steal ticks
  python bench_extra.py --queries a,b,c  # specific queries
  python bench_extra.py --plans out_dir  # write explain('formatted')
                                         # for every headline query
  python bench_extra.py --all            # every declared query, 1 pass

Protocol mirrors bench.py (same warmups, same noop sink, same
local[$SPARK_GRAFT_CPUS] master, same $SPARK_GRAFT_SF_DIR data) but
runs each query ``--passes`` times (default 3) so minima are
comparable under this host's one-sided steal noise. Prints one JSON
line per query with all passes + per-pass steal CPU-seconds."""

from __future__ import annotations

import argparse
import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _steal() -> int | None:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return None


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session():
    from grisp_spark.session import get_spark

    spark = get_spark(
        "bench_extra", cores=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # bench.py's exact warmups: JVM codegen/scheduler + Arrow channel
    _noop(spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count())
    _noop(spark.range(100_000).repartition(CPUS).mapInPandas(lambda it: it, "id long"))
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, metavar="DIR")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    import bench as bench_mod

    qs = entry_mod.queries()
    if args.queries:
        names = args.queries.split(",")
    elif args.all:
        names = list(qs)
    else:
        names = list(bench_mod.HEADLINE)
    spark = _session()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {name}", file=sys.stderr)
        return

    passes = 1 if args.all else args.passes
    for name in names:
        secs, steals = [], []
        for _ in range(passes):
            s0 = _steal()
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            _noop(qs[name](spark, SF_DIR))
            secs.append(round(time.monotonic() - t0, 3))
            s1 = _steal()
            steals.append(
                round((s1 - s0) / 100.0, 1)
                if s0 is not None and s1 is not None
                else None
            )
        print(
            json.dumps(
                {"query": name, "passes": secs, "min": min(secs),
                 "steal_cpu_s": steals, "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1]}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

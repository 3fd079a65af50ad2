"""Run every queries() entry as the FIRST query of a fresh Spark
session at sf0.01 — the plan shape the driver may present and the one
that trips Catalyst's INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on pandas-UDF
self-joins (see operators/similarity.py::neardup_pairs_lsh). One
subprocess per query; prints FAIL lines and a summary.

Usage: python scripts/first_in_session_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys

_CHILD = """
import sys
import __spark_entry__ as e
from grisp_spark.session import get_spark
spark = get_spark("sweep", cores=8, shuffle_partitions=8,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
name = sys.argv[1]
if name == "q39_triples_prior_shuffle":
    # the oversized-gazetteer path composes pandas-UDF scoring with
    # self-join-adjacent shapes (the binding-bug class) AND must keep
    # its no-KB-broadcast property as the first query of a session
    for k in ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold"):
        spark.conf.set(k, "-1")
df = e.queries()[name](spark, sys.argv[2])
if name == "q39_triples_prior_shuffle":
    from grisp_spark.plans import physical_plan
    plan = physical_plan(df)
    # under the disabled thresholds every BroadcastExchange must come
    # from an explicit hint on a provably tiny frame: rewrite_linked's
    # canonical map (canonicalize.py:69, joins on entity_id and
    # projects canonical_id). Since the late-r7 single-shuffle
    # _dense_ids the partition-offset vector rides in the Arrow task
    # closure, so no _pid offset broadcast should render at all —
    # but keep accepting it by content in case a build re-plans.
    # The KB/linking joins themselves must all be shuffle joins.
    lines = plan.split("\\n")
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        subtree = "\\n".join(lines[i : i + 4])
        assert "_pid#" in subtree or "canonical_id#" in subtree, subtree
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
df.write.format("noop").mode("overwrite").save()
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entry_mod

    names = sorted(entry_mod.queries())
    failures = []
    for i, name in enumerate(names):
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, name, sf_dir],
            capture_output=True, text=True, cwd=root,
        )
        status = "ok" if r.returncode == 0 else "FAIL"
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)
        if r.returncode != 0:
            failures.append(name)
            tail = [ln for ln in r.stderr.splitlines() if "Error" in ln][:2]
            print("    " + "\n    ".join(tail), flush=True)
    print(f"SWEEP DONE: {len(names) - len(failures)}/{len(names)} ok; "
          f"failures: {failures}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

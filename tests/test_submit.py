"""The north rule's delivery vehicle: the pipeline must run via
``spark-submit --py-files`` (scripts/submit.sh zips grisp_spark/ and
submits kg/pipeline.py). This exercises the real packaging path — a
missing module in the zip or an import that only works from the repo
root fails HERE, not on the cluster."""

import json
import os
import shutil
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, ".data", "submit_test")
OUT = os.path.join(ROOT, ".data", "submit_test_out")


def test_spark_submit_pyfiles_end_to_end():
    from grisp_spark.kg.datagen import write_dataset

    shutil.rmtree(DATA, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)
    write_dataset(DATA, seed=7, n_convs=50)
    r = subprocess.run(
        ["bash", "scripts/submit.sh", DATA, OUT, "--master", "local[4]"],
        capture_output=True, text=True, cwd=ROOT, timeout=280,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["triples"] > 0 and stats["linked"] > 0
    # the named outputs the stage materializes (S5 multi-output sink)
    for name in ("triples", "canonical_map", "adjacency", "counters"):
        assert os.path.isdir(os.path.join(OUT, name)), name
    assert os.path.isdir(os.path.join(OUT, "_lineage"))

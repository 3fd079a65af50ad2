#!/usr/bin/env bash
# Cluster submission for the KG pipeline (north rule: spark-submit
# --py-files on a multi-executor cluster). Usage:
#   scripts/submit.sh <data_dir_or_iceberg:table> <out_dir> [spark-submit args...]
#
# Example at N and 4N executors (the scaling-efficiency protocol):
#   scripts/submit.sh s3://bucket/conv out/ --num-executors 250 ...
#   scripts/submit.sh s3://bucket/conv out/ --num-executors 1000 ...
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR="$1"; OUT_DIR="$2"; shift 2

ZIP=.build/grisp_spark.zip
mkdir -p .build
rm -f "$ZIP"
(zip -qr "$ZIP" grisp_spark -x '*__pycache__*')

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$@" \
  grisp_spark/kg/pipeline.py "$DATA_DIR" "$OUT_DIR"

#!/usr/bin/env bash
# Run the two-parallelism scaling benchmark under spark-submit (the north
# rule's execution mode). Packages the library jar, then submits
# graft.ScalingBench, which builds + queries the same corpus at local[8]
# and local[32] and writes BENCH/scaling-latest.md (appends BENCH/scaling-runs.jsonl).
#
# Usage: scripts/scaling-bench-submit.sh [nDocs]
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
JAR=$(ls target/scala-2.13/*.jar | grep -v -- -tests | head -1)
N=${1:-150000}
exec /opt/spark/bin/spark-submit \
  --master "local[32]" \
  --driver-memory "${SPARK_DRIVER_MEM:-32g}" \
  --driver-java-options "-XX:+UseParallelGC" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --class graft.ScalingBench \
  "$JAR" "$N"

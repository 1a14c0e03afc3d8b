#!/usr/bin/env bash
# Full verification gate in one shot: unit/property/duel specs, the driver's
# correctness dump at sf0.01, and the per-round benchmark at sf0.1.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test (codec properties, analyzer fixtures, rank-identity duels,"
echo "   merge/deletes/positions/streaming specs) =="
sbt -batch test

echo "== Verify: all SparkEntry queries -> parquet + oracle_sql.json =="
OUT=${1:-/tmp/graft-verify-out}
rm -rf "$OUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
echo "wrote $OUT (driver compares each <name>.parquet against its DuckDB oracle)"

echo "== DuckDB oracle self-check (fails the gate on any mismatch) =="
python3 scripts/oracle_check.py "$OUT" /root/testdata/sf0.01

echo "== Bench at sf0.1 =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  sbt -batch "runMain graft.Bench"

#!/bin/bash
# ONE round-close gate (judge r13 Next #7): the four close steps in
# order, exit-code gated — a red in any step stops the close before
# BASELINE.md can be stamped on it. The r12 bookkeeping incidents
# (a26abb8 bench clobber; quiet-box drift adjudicated late) were both
# multi-step-discipline failures this script makes mechanical.
#
#   1. sbt test                      — the full unit/spec suite
#   2. Verify @ sf0.01 + DuckDB      — the driver-style correctness gate
#   3. Bench FULL @ sf0.1            — writes the close comparator
#      (bench_result.json IN THE REPO ROOT; commit it — it is the
#      round's adjudication comparator)
#   4. scale_check.sh                — the 1x/10x exponent gate
#
# Usage: scripts/close.sh            (from the repo root)
# Env:   SPARK_GRAFT_SF_DIR_BENCH (default /root/testdata/sf0.1)
#        SPARK_GRAFT_MAX_EXP      (default 0.85)
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
BENCH_DIR="${SPARK_GRAFT_SF_DIR_BENCH:-/root/testdata/sf0.1}"
MAX_EXP="${SPARK_GRAFT_MAX_EXP:-0.85}"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"

echo "[close] 1/4 sbt test"
sbt -batch test

echo "[close] 2/4 Verify @ sf0.01 + DuckDB oracle"
VOUT="$REPO/target/verify_close"
rm -rf "$VOUT"
( cd /tmp && java $OPENS -Xmx16g -XX:ReservedCodeCacheSize=1g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Verify /root/testdata/sf0.01 "$VOUT" )
python3 "$REPO/scripts/oracle_check.py" /root/testdata/sf0.01 "$VOUT"

echo "[close] 3/4 full Bench @ $BENCH_DIR (writes $REPO/bench_result.json — the committed comparator)"
( cd "$REPO" && SPARK_GRAFT_SF_DIR="$BENCH_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    java $OPENS -Xmx16g -XX:ReservedCodeCacheSize=1g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench | tee "$REPO/target/bench_close.stdout" | grep '"metric"' )

echo "[close] 4/4 exponent gate (max_exp=$MAX_EXP)"
bash "$REPO/scripts/scale_check.sh" "$MAX_EXP"

echo "[close] ALL GREEN — commit bench_result.json AND bench10x_result.json (the 1x and 10x round comparators) with BASELINE.md"

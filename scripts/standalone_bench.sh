#!/bin/bash
# Standalone adjudication runner: one FRESH JVM per query row, median-of-3
# (Bench's own protocol: warm-up + 3 timed reps, median), quiet box.
# Usage: standalone_bench.sh <outfile> <query1> [query2 ...]
set -u
# realpath: the per-query `cd /tmp` below would otherwise retarget a
# relative $OUT mid-run — truncated in the launch cwd, appended in /tmp
OUT="$(realpath "$1")"; shift
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
: > "$OUT"
for Q in "$@"; do
  cd /tmp  # bench_result.json from standalone runs must not clobber the repo's
  LINE=$(SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    java $OPENS -Xmx8g -XX:ReservedCodeCacheSize=1g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench 2>/dev/null | grep '"metric"')
  echo "$Q $LINE" >> "$OUT"
done

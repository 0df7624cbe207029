#!/bin/bash
# OFF-CONTRACT correctness sweep (the r15/r16 bonus practice as a
# command): run Verify + the DuckDB oracle at EVERY scale whose oracles
# are scale-invariant — sf0.001 and sf0.01 — not just the sf0.01 the
# driver gates on. The r15 sweep found the ADC/rerank floor; the r16
# sweep found the one scale-pinned oracle (dedup_shingle_auto, since
# upgraded to a full SQL replay). A row that passes at one scale and
# fails at another is either a scale-dependent bug (fix it) or a
# scale-pinned oracle (upgrade it to a replay or a generated fixture).
#
# Usage: scripts/sweep.sh        (from the repo root, after sbt compile)
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"

for SF in sf0.001 sf0.01; do
  OUT="$REPO/target/sweep_$SF"
  rm -rf "$OUT"
  echo "[sweep] Verify @ $SF"
  ( cd /tmp && java $OPENS -Xmx16g -XX:ReservedCodeCacheSize=1g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Verify "/root/testdata/$SF" "$OUT" )
  echo "[sweep] oracle @ $SF"
  python3 "$REPO/scripts/oracle_check.py" "/root/testdata/$SF" "$OUT"
done
echo "[sweep] both scales green"

#!/bin/bash
# CI-style scale gate: run the 1x/10x probe and FAIL (exit 2) if any
# non-gate operator's last-leg scaling exponent exceeds the bound.
# Usage: scale_check.sh [max_exp]   (default 0.85 — every r11-measured
# operator leg sat at 0.02-0.48, so 0.85 catches super-linear creep with
# ample noise margin while still failing an O(N^2) regression, which
# reads ~2.0 on the 1x->10x leg)
# For MULTI-point runs (SPARK_GRAFT_SCALE_POINTS=10,20) also export
# SPARK_GRAFT_SCALE_STANDALONE=1: the r12 three-point close measured the
# in-process mode inflating late cells 3-9x (text_boilerplate 22.0 s vs
# 5.6 s fresh-JVM at 20x — exponent 3.15 vs true 0.79), so asymptotic
# legs are only honest when each (operator, scale) cell gets its own JVM.
set -u
MAX_EXP="${1:-0.85}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SCALE_MAX_EXP="$MAX_EXP" \
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java $OPENS -Xmx16g -XX:ReservedCodeCacheSize=1g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScaleProbe

#!/usr/bin/env bash
# Isolated-row bench protocol (VERDICT r9 #8): this box shows ±4x run-to-run
# wall-clock noise and queries sharing a JVM interfere via memory/GC, so any
# row that looks slow IN-SUITE must be re-measured ALONE before drawing
# conclusions. Runs graft.Bench once per named query in its own fresh JVM
# (direct java — no sbt lock contention) and prints one line per query.
#
# Usage: tools/bench_isolated.sh [sfDir] [cpus] q1 q2 ...
#        tools/bench_isolated.sh /root/testdata/sf0.1 16 t_gate_patterns s_knn_pq
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"; shift || true
CPUS="${1:-16}"; shift || true
OPENS=(--add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED)
cd "$(dirname "$0")/.."
for q in "$@"; do
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_ONLY="$q" \
    java "${OPENS[@]}" -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench 2>/dev/null | grep -o "\"$q\":[0-9.]*" || echo "\"$q\":ERROR"
done

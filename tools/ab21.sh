#!/bin/bash
# Interleaved A/B for round 21 (the r20 adjudication protocol): arm A =
# pre-round classes snapshot, arm B = the working tree's classes,
# alternating full Bench invocations over the touched-gate subset inside
# one window; medians across pairs are the graded signal.
# Usage: ab21.sh <armA_classes> <armB_classes> <gates_csv> <pairs> <outdir>
set -u
A="$1"; B="$2"; GATES="$3"; PAIRS="${4:-3}"; OUT="${5:-/tmp/r21_ab}"
mkdir -p "$OUT"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() { # $1 classes, $2 outfile
  SPARK_GRAFT_BENCH_QUERIES="$GATES" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx${SPARK_DRIVER_MEM:-24g} \
    -cp "$1:/opt/spark/jars/*" graft.Bench 2>"$2.err" | grep '{"metric"' > "$2"
}
for i in $(seq 1 "$PAIRS"); do
  echo "pair $i arm A $(date +%H:%M:%S)"; run "$A" "$OUT/A$i.json"
  echo "pair $i arm B $(date +%H:%M:%S)"; run "$B" "$OUT/B$i.json"
done
echo done

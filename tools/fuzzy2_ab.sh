#!/usr/bin/env bash
# A/B bench harness for a single query across two committed binaries.
#
# Motivation (rounds 9-11): q_join_fuzzy2's whole-run bench number swung
# 6 <-> 31 s across rounds while byte-identical binaries reproduced BOTH
# values on this host.  This harness removes every confound except the
# binary: same host, same session config (DevSession/BenchSome), FRESH JVM
# per invocation, A/B ALTERNATED so slow host windows land on both sides
# equally.  Each invocation prints 3 in-JVM reps (first = cold page
# cache/codegen, later = steady state).
#
# Usage: tools/fuzzy2_ab.sh <commitA> <commitB> [query] [rounds] [cpus]
# Output: per-invocation BENCHSOME lines tagged A:/B: plus min-of-run
# summaries.  Record the result in BASELINE.md.
set -euo pipefail
A_REF=${1:?commitA}
B_REF=${2:?commitB}
QUERY=${3:-q_join_fuzzy2}
ROUNDS=${4:-5}
CPUS=${5:-4}
SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
WORK=/tmp/graft_ab
mkdir -p "$WORK"

build_jar() {
  local ref=$1 out=$2
  if [[ -f "$out" ]]; then echo "reusing $out"; return; fi
  local wt="$WORK/wt_$ref"
  if [[ ! -d "$wt" ]]; then git -C /root/repo worktree add --detach "$wt" "$ref"; fi
  (cd "$wt" && sbt -batch package > "$WORK/build_$ref.log" 2>&1)
  cp "$wt"/target/scala-2.13/*.jar "$out"
  echo "built $out from $ref"
}

build_jar "$A_REF" "$WORK/a.jar"
build_jar "$B_REF" "$WORK/b.jar"

run_one() {
  local tag=$1 jar=$2
  SPARK_GRAFT_CPUS=$CPUS java -Xmx16g -XX:+UseG1GC \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    -cp "/opt/spark/jars/*:$jar" graft.BenchSome "$SF_DIR" "$QUERY" 2>/dev/null \
    | grep BENCHSOME | sed "s/^/$tag: /"
}

echo "=== A=$A_REF B=$B_REF query=$QUERY rounds=$ROUNDS cpus=$CPUS sf=$SF_DIR ==="
for i in $(seq 1 "$ROUNDS"); do
  echo "--- round $i ---"
  run_one A "$WORK/a.jar"
  run_one B "$WORK/b.jar"
done

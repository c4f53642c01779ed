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

# jars are cached BY COMMIT SHA (never by A/B role): reusing a role-named
# jar across invocations with different refs would silently bench the
# previous run's binaries
build_jar() {
  local ref=$1
  local sha
  sha=$(git -C /root/repo rev-parse "$ref")
  local out="$WORK/jar_$sha.jar"
  if [[ ! -f "$out" ]]; then
    local wt="$WORK/wt_$sha"
    if [[ ! -d "$wt" ]]; then git -C /root/repo worktree add --detach "$wt" "$sha" >&2; fi
    (cd "$wt" && sbt -batch package > "$WORK/build_$sha.log" 2>&1)
    cp "$wt"/target/scala-2.13/*.jar "$out"
    echo "built $out from $ref" >&2
  fi
  echo "$out"
}

A_JAR=$(build_jar "$A_REF")
B_JAR=$(build_jar "$B_REF")

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
  run_one A "$A_JAR"
  run_one B "$B_JAR"
done

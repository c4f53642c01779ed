#!/usr/bin/env bash
# The binding pre-close oracle gate (SURVEY §8, round 14): a fresh-process
# full Verify drive at sf0.001 plus the DuckDB compare under a 2048-fd
# ulimit (the driver's constraint class — an oracle that only runs with
# unlimited fds is not runnable).  Run AFTER the last judged query lands;
# SURVEY ledger counts are written from this output.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-/tmp/preclose_gate}"
rm -rf "$OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" > /tmp/preclose_verify.log 2>&1 || {
  echo "VERIFY DRIVER FAILED — tail of log:"; tail -20 /tmp/preclose_verify.log; exit 1; }
if grep '\[verify\]' /tmp/preclose_verify.log; then
  echo "PER-QUERY VERIFY FAILURES ABOVE"; exit 1
fi
ulimit -n 2048
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR"

#!/usr/bin/env bash
# Round-gate hygiene (VERDICT r10 item 7): "artifacts or it didn't
# happen". Run before the round snapshot commit so a non-compiling or
# red HEAD can never reach the driver gate (the r9 failure mode:
# BENCH_r09 rc=1, CORRECTNESS_r09 = {}).
#
# Usage: tools/round_check.sh [sfDir] [verifyOutDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/round_check}

echo "== 1/4 compile =="
sbt -batch compile

echo "== 2/4 scalatest =="
sbt -batch test

echo "== 3/4 verify dump + DuckDB oracle compare ($SF) =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check.py "$SF" "$OUT"

echo "== 4/4 bench smoke (sf0.001, 1 run) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_RUNS=1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/round_check_bench.json \
  sbt -batch "runMain graft.Bench" > /dev/null
grep -o '"metric":"total","value":[0-9.]*' /tmp/round_check_bench.json

echo "ROUND CHECK GREEN"

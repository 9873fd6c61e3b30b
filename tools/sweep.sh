#!/bin/bash
# Cross-scale correctness sweep — the round-5 standing gate (VERDICT r4 #7).
# Runs every SparkEntry query at all /root/testdata/sf* scales through one
# Verify invocation (SPARK_GRAFT_SWEEP=1), then DuckDB-compares each scale.
# Scale-dependent properties (e.g. the round-4 text_fingerprint sketch
# collision at sf0.001) only surface here — run before every round hand-off.
# Env-gated so the driver's own budget is unaffected.
set -e
cd "$(dirname "$0")/.."
rm -rf target/verify_sweep
SPARK_GRAFT_SWEEP=1 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_sweep"
rc=0
for d in target/verify_sweep/sf*; do
  sf=$(basename "$d")
  echo "== DuckDB compare at $sf =="
  python3 tools/check_oracle.py "/root/testdata/$sf" "$d" || rc=1
done
exit $rc

#!/bin/bash
# Driver-friendly bench wrapper (round 17 — VERDICT r16 item 2).
#
# The bench contract prints ONE JSON line on stdout, but invoking it through
# `sbt "runMain graft.Bench"` used to append sbt's "[success] Total time..."
# epilogue after it; a bounded-tail stdout capture then sees sbt noise as
# the last line and the per-query JSON truncated at the front — which is why
# PERF_r12..r16 all carry `parsed: null`. Two fixes ship together:
#   1. build.sbt sets `Global / showSuccess := false`, so even a direct
#      `sbt "runMain graft.Bench"` ends its stdout with the JSON line;
#   2. this wrapper additionally re-emits the JSON line as the final stdout
#      line after sbt exits, so the contract holds regardless of sbt
#      version/epilogue behavior.
#
# Usage: identical env contract as the raw bench —
#   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_WARMUP_SF_DIR,
#   SPARK_GRAFT_BENCH_RUNS, SPARK_GRAFT_BENCHFULL_OUT, ...
#   tools/bench.sh
set -o pipefail
cd /root/repo

TMP=$(mktemp /tmp/graft_bench_out.XXXXXX)
trap 'rm -f "$TMP"' EXIT

sbt -batch "runMain graft.Bench" | tee "$TMP"
rc=$?

# Re-emit the bench's JSON result line (starts with {"metric") as the final
# stdout line. If the bench died before printing it, emit nothing extra —
# the caller sees sbt's own failure output and the non-zero exit code.
LINE=$(grep -a '^{"metric"' "$TMP" | tail -1)
if [ -n "$LINE" ]; then
  echo "$LINE"
fi
exit $rc

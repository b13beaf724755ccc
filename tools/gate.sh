#!/usr/bin/env bash
# One-command provability gate: compile -> test -> verify vs DuckDB
# oracle -> bench. Mirrors what the round driver runs, so a green gate
# here means a green round.
#
# Usage:
#   tools/gate.sh              # gate scale (sf0.01), no bench
#   tools/gate.sh --quick     # iterating scale (sf0.001), no tests/bench
#   tools/gate.sh --full      # sf0.01 + sf0.1 bench (the full round shape)
#
# Gotchas encoded here (see .claude/skills/verify/SKILL.md for more):
# Spark logs land on stderr as [error]; only check.py's final
# "N pass, 0 fail" line and the one-line bench JSON matter.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-gate}"
case "$MODE" in
  --quick) SF=/root/testdata/sf0.001; RUN_TESTS=0; RUN_BENCH=0 ;;
  --full)  SF=/root/testdata/sf0.01;  RUN_TESTS=1; RUN_BENCH=1 ;;
  gate)    SF=/root/testdata/sf0.01;  RUN_TESTS=1; RUN_BENCH=0 ;;
  *) echo "unknown mode '$MODE' (use --quick, --full, or no argument)"; exit 2 ;;
esac

# logs live OUTSIDE the verify output dir: check.py treats every entry
# of the output dir as a query result, so a stray gate.log would be
# reported as a failing query
OUT=$(mktemp -d /tmp/graft_gate.XXXXXX)
LOGS=$(mktemp -d /tmp/graft_gatelog.XXXXXX)
LOG=$LOGS/gate.log

echo "== gate: compile =="
sbt -batch compile

if [[ "$RUN_TESTS" == 1 ]]; then
  echo "== gate: sbt test =="
  if ! sbt -batch test > "$LOG" 2>&1; then
    # grep must not abort the diagnostics under set -e when the log has
    # no test lines (e.g. a compile error)
    grep -E "\*\*\* FAILED|Failed tests|Tests:|error\]" "$LOG" | head -20 || true
    echo "TESTS FAILED (full log: $LOG)"
    exit 1
  fi
  grep -hE "^\[info\] Tests:" "$LOG" | tail -20 || true
fi

echo "== gate: verify @$SF =="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | { grep -E "\[verify\].*failed" || true; } | tee "$LOGS/verify_fail.log"
[[ -s $LOGS/verify_fail.log ]] && { echo "VERIFY QUERY FAILED"; exit 1; }

echo "== gate: oracle check =="
# check.py exits nonzero on any mismatch; capture instead of letting
# pipefail kill the script before the verdict prints
python3 tools/check.py "$SF" "$OUT" > "$LOGS/check.log" 2>&1 || true
tail -3 "$LOGS/check.log"
grep -q " 0 fail" <(tail -1 "$LOGS/check.log") \
  || { echo "ORACLE MISMATCH (full log: $LOGS/check.log)"; exit 1; }

if [[ "$RUN_BENCH" == 1 ]]; then
  echo "== gate: bench @sf0.1 =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"metric".*}'
fi

echo "== gate: GREEN =="

#!/usr/bin/env bash
# End-of-round gate (VERDICT r16 Next #1): the snapshot commit MUST be
# conditional on this script exiting 0. It runs, at the CURRENT working
# tree (i.e. final HEAD candidate):
#   1. the FULL sbt test suite (includes PlanGuardSpec + the
#      collect-allowlist sweep that shipped red in r13/r14/r16), and
#   2. the sf0.01 Verify + DuckDB oracle gate (the driver's own check).
# A red run blocks the round close. Usage:
#   tools/endround.sh            # full gate (test + verify)
#   tools/endround.sh --verify-only   # just the oracle gate
set -u
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT_DIR="$(mktemp -d /tmp/graft_endround.XXXXXX)"
LOG="$OUT_DIR/endround.log"
fail=0

if [[ "${1:-}" != "--verify-only" ]]; then
  echo "[endround] sbt test (full suite) ..."
  if ! sbt -error test >"$LOG" 2>&1; then
    echo "[endround] RED: sbt test failed — tail of log:"
    tail -40 "$LOG"
    fail=1
  else
    # surface the suite count so the round notes can quote it
    grep -E "Tests: succeeded|All tests passed" "$LOG" | tail -2
    echo "[endround] sbt test GREEN"
  fi
fi

echo "[endround] Verify gate at $SF_DIR ..."
if ! sbt -error "runMain graft.Verify $SF_DIR $OUT_DIR/verify" >"$LOG.verify" 2>&1; then
  echo "[endround] RED: graft.Verify failed — tail of log:"
  tail -40 "$LOG.verify"
  fail=1
elif ! python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR/verify"; then
  echo "[endround] RED: oracle comparison failed (see above)"
  fail=1
else
  echo "[endround] Verify gate GREEN"
fi

if [[ $fail -ne 0 ]]; then
  echo "[endround] GATE RED — do NOT commit the round snapshot."
  exit 1
fi
echo "[endround] GATE GREEN — safe to commit."

#!/usr/bin/env bash
# One-command correctness gate: runs the driver contract (graft.Verify)
# and the DuckDB oracle compare (scripts/selfcheck.py) at sf0.01 AND
# sf0.001, exiting nonzero on any FAIL. Pass --test to also run the
# ScalaTest suite first. This is the same recipe the round driver runs;
# run it before every round snapshot.
#
# Usage: scripts/gate.sh [--test]
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0

if [[ "${1:-}" == "--test" ]]; then
  echo "== sbt test =="
  if ! sbt -batch test > /tmp/gate_sbt_test.log 2>&1; then
    echo "GATE: sbt test FAILED (log: /tmp/gate_sbt_test.log)"
    fail=1
  fi
  grep -E "Tests:|All tests" /tmp/gate_sbt_test.log | tail -2
fi

for sf in 0.01 0.001; do
  out="/tmp/gate_out_sf${sf}"
  echo "== Verify + selfcheck at sf${sf} =="
  # sbt tags Spark INFO on stderr as [error]; only [verify] lines matter
  sbt -batch "runMain graft.Verify /root/testdata/sf${sf} ${out}" 2>&1 \
    | grep -E "^\[error\] \[verify\]" || true
  if ! python3 scripts/selfcheck.py "/root/testdata/sf${sf}" "${out}" | tail -1; then
    echo "GATE: selfcheck FAILED at sf${sf}"
    fail=1
  fi
done

if [[ $fail -eq 0 ]]; then
  echo "GATE: PASS (both scale factors)"
else
  echo "GATE: FAIL"
fi
exit $fail

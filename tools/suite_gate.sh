#!/usr/bin/env bash
# End-of-round snapshot gate (round-13 verdict item 3): the same defect
# class shipped twice — r12 registered a query without its oracle, r13
# committed a spec without running the suite. This script makes "suite
# green" a PRECONDITION of the snapshot instead of a convention: it runs
# the full ScalaTest suite, refuses (exit 1) on any failure, and on
# success writes SUITE_GREEN.md recording the run (HEAD, date, the
# suite's own derived counts — never hand-counted) so the snapshot
# commit carries the proof.
#
# Usage: tools/suite_gate.sh   (from the repo root; ~3-4 min)
set -u
cd "$(dirname "$0")/.."

LOG=$(mktemp /tmp/suite_gate.XXXXXX.log)
echo "[suite_gate] running full suite -> $LOG"
sbt -batch test >"$LOG" 2>&1
STATUS=$?

SUMMARY=$(grep -E "^\[info\] Tests: " "$LOG" | tail -1 | sed 's/^\[info\] //')
SUITES=$(grep -E "^\[info\] Suites: " "$LOG" | tail -1 | sed 's/^\[info\] //')

if [ $STATUS -ne 0 ] || ! echo "$SUMMARY" | grep -q "failed 0, canceled 0"; then
  echo "[suite_gate] RED — refusing to stamp a snapshot marker"
  echo "[suite_gate] $SUMMARY"
  grep -E "\*\*\* FAILED \*\*\*|TESTS? FAILED" "$LOG" | head -20
  exit 1
fi

cat > SUITE_GREEN.md <<EOF
# Suite gate

Last green full-suite run (written by \`tools/suite_gate.sh\`; a red
suite refuses to write this file, so a snapshot commit containing a
fresh version of it provably followed a green \`sbt test\`):

- date: $(date -u +"%Y-%m-%dT%H:%M:%SZ")
- HEAD at run time: $(git rev-parse HEAD)
- working tree: $(if [ -z "$(git status --porcelain -- src build.sbt)" ]; then echo clean; else echo "DIRTY (src/build.sbt changes beyond HEAD were part of this run)"; fi)
- $SUMMARY
- $SUITES

Counts above are the suite's own output — derived, not hand-maintained
(round-13 verdict item 4).
EOF
echo "[suite_gate] GREEN — $SUMMARY"
echo "[suite_gate] wrote SUITE_GREEN.md"

#!/usr/bin/env bash
# Fault-injection probe for graft.io.IO.compactLandingManifest: kill -9
# the JVM inside each of the fold's two crash windows and verify the
# manifest reads back identical and the next fold converges.
#   window A -- fold in progress: _checkpoint.__swap_tmp exists,
#               _checkpoint does not (live state untouched);
#   window B -- swap done, segment deletes underway: _checkpoint exists
#               while seg_* dirs remain (readers dedup; re-fold
#               idempotent).
# Run from the repo root: tools/probes/probe_compact_kill9.sh
set -u
cd "$(dirname "$0")/../.."
SHELL_ARGS="--master local[16] --conf spark.ui.enabled=false \
  --conf spark.ui.showConsoleProgress=false \
  --conf spark.sql.shuffle.partitions=16 --conf spark.sql.session.timeZone=UTC \
  --driver-class-path target/scala-2.13/classes"
MAN=/tmp/probe_compact_kill9/man
export CPK9_SEGMENTS=${CPK9_SEGMENTS:-20000}

run_kill() { # $1 = window label, $2 = poll predicate (shell function)
  local LOG; LOG=$(mktemp /tmp/compact_kill9.XXXXXX.log)
  CPK9_FRESH=1 /opt/spark/bin/spark-shell $SHELL_ARGS \
    -i tools/probes/probe_compact_kill9_phase1.sc >"$LOG" 2>&1 &
  local P1=$!
  local hit=0
  # stage 1: coarse poll until the fold's staged write begins (the
  # swap tmp dir appears) -- everything before it is dead time
  for i in $(seq 1 3000); do
    if grep -q "CPK9 compact_done" "$LOG"; then break; fi
    [ -e "$MAN/_checkpoint.__swap_tmp" ] && break
    sleep 0.1
  done
  # stage 2: tight poll (the B window -- swap done, deletes running --
  # is under a second on a local fs, so the predicate must be O(1) and
  # the sleep small)
  for i in $(seq 1 40000); do
    if grep -q "CPK9 compact_done" "$LOG"; then break; fi
    if $2; then hit=1; break; fi
    sleep 0.01
  done
  if [ "$hit" != 1 ]; then
    echo "CPK9 FAIL: window $1 never observed (fold finished first?)"
    grep CPK9 "$LOG"; kill -9 $P1 2>/dev/null; exit 1
  fi
  local PIDS; PIDS=$(pgrep -f "probe_compact_kill9_phase1" || true)
  echo "CPK9 window $1 hit -- killing: $PIDS"
  kill -9 $PIDS 2>/dev/null
  wait $P1 2>/dev/null
  /opt/spark/bin/spark-shell $SHELL_ARGS \
    -i tools/probes/probe_compact_kill9_phase2.sc 2>/dev/null | grep CPK9
}

in_window_a() {
  [ -e "$MAN/_checkpoint.__swap_tmp" ] && [ ! -e "$MAN/_checkpoint" ]
}
# O(1) B predicate: globStatus deletes run in name order, so the LAST
# segment (by name) survives the delete loop longest -- checkpoint
# present + last segment present == deletes in flight (or pending)
LAST_SEG=$(printf 'seg_%013d_%08x.json' \
  $((1700000000000 + CPK9_SEGMENTS - 1)) $((CPK9_SEGMENTS - 1)))
in_window_b() {
  [ -e "$MAN/_checkpoint" ] && [ -e "$MAN/$LAST_SEG" ]
}

echo "== window A: kill mid-fold (before the swap) =="
run_kill A in_window_a
echo "== window B: kill mid-delete (after the swap) =="
run_kill B in_window_b
echo "CPK9 ALL WINDOWS PASS"

#!/usr/bin/env bash
# Fault-injection probe for the per-consumer-id bootstrap lock
# (Streams.runManifestIngestStream bootstrapFromCheckpoint, round 20):
# kill -9 the joining JVM inside the bootstrap window and verify the
# documented recovery -- loud refusal naming the dead holder, then
# takeoverCrashedBootstrap convergence. Two sub-windows:
#   window A -- mid-SEED: .bootstrap_k.lock exists, the batch_id=-1
#               band has no _SUCCESS yet;
#   window B -- mid-DRAIN: seed committed (_SUCCESS present), the
#               _graft_bootstrap.json sentinel not yet written.
# Run from the repo root: tools/probes/probe_bootstrap_kill9.sh
set -u
cd "$(dirname "$0")/../.."
SHELL_ARGS="--master local[16] --conf spark.ui.enabled=false \
  --conf spark.ui.showConsoleProgress=false \
  --conf spark.sql.shuffle.partitions=16 --conf spark.sql.session.timeZone=UTC \
  --driver-class-path target/scala-2.13/classes"
ROOT=/tmp/probe_bootstrap_kill9
LOCK=$ROOT/man/_consumers/.bootstrap_k.lock
SEED_OK=$ROOT/out_k/batch_id=-1/_SUCCESS
SENTINEL=$ROOT/ck_k/_graft_bootstrap.json
export BK9_FILES=${BK9_FILES:-20000}

run_kill() { # $1 = window label, $2 = poll predicate (shell function)
  local LOG; LOG=$(mktemp /tmp/bootstrap_kill9.XXXXXX.log)
  BK9_FRESH=1 /opt/spark/bin/spark-shell $SHELL_ARGS \
    -i tools/probes/probe_bootstrap_kill9_phase1.sc >"$LOG" 2>&1 &
  local P1=$!
  local hit=0
  for i in $(seq 1 40000); do
    if grep -q "BK9 bootstrap_done" "$LOG"; then break; fi
    if $2; then hit=1; break; fi
    sleep 0.01
  done
  if [ "$hit" != 1 ]; then
    echo "BK9 FAIL: window $1 never observed (bootstrap finished first?)"
    grep BK9 "$LOG"; kill -9 $P1 2>/dev/null; exit 1
  fi
  local PIDS; PIDS=$(pgrep -f "probe_bootstrap_kill9_phase1" || true)
  echo "BK9 window $1 hit -- killing: $PIDS"
  kill -9 $PIDS 2>/dev/null
  wait $P1 2>/dev/null
  /opt/spark/bin/spark-shell $SHELL_ARGS \
    -i tools/probes/probe_bootstrap_kill9_phase2.sc 2>/dev/null | grep BK9
}

in_window_a() {
  [ -e "$LOCK" ] && [ ! -e "$SEED_OK" ] && [ ! -e "$SENTINEL" ]
}
in_window_b() {
  [ -e "$LOCK" ] && [ -e "$SEED_OK" ] && [ ! -e "$SENTINEL" ]
}

echo "== window A: kill mid-seed (lock held, seed uncommitted) =="
run_kill A in_window_a
echo "== window B: kill mid-drain (seed committed, sentinel pending) =="
run_kill B in_window_b
echo "BK9 ALL WINDOWS PASS"

#!/bin/bash
# Driver for probe_spill_pressure.sc: run the identical workload at
# descending memory, holding per-core heap at-or-above Spark's sane
# floor (~384-512 MB/core) -- below that, untracked allocations
# (shuffle-fetch netty buffers at ~48 MB/task, read-ahead buffers)
# exhaust the heap before the spill machinery can engage, which is a
# deployment sizing error, not an operator defect. PASS = every run
# completes, the tight runs show nonzero spill_disk_mb, and the result
# checksums are identical across configs.
set -u
cd "$(dirname "$0")/../.."
out=/tmp/spill_probe_$$
for cfg in "16g 32" "4g 8" "3g 8" "2g 4"; do
  set -- $cfg
  echo "=== heap $1 cores $2 ==="
  /opt/spark/bin/spark-shell --master "local[$2]" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.shuffle.partitions=32 \
    --conf spark.sql.session.timeZone=UTC \
    --driver-memory "$1" \
    --driver-class-path target/scala-2.13/classes \
    -i tools/probes/probe_spill_pressure.sc -e ':quit' 2>&1 \
    | tr '\r' '\n' | grep -E "PROBE_SPILL|OutOfMemory|Can't acquire" | tee -a "$out"
done
echo "=== summary ==="
cat "$out"
# every config must EMIT a result line (a config that OOM-aborts emits
# none — counting only distinct values among survivors would let the
# exact failure this probe exists to catch read as a pass)
n_cfg=4
n_x2=$(grep -c "x2_neardup_1m result=" "$out")
n_x17=$(grep -c "x17_semdedup_250k result=" "$out")
d_x2=$(grep -o "x2_neardup_1m result=[0-9_-]*" "$out" | sort -u | wc -l)
d_x17=$(grep -o "x17_semdedup_250k result=[0-9_-]*" "$out" | sort -u | wc -l)
echo "x2 runs: $n_x2/$n_cfg distinct: $d_x2 | x17 runs: $n_x17/$n_cfg distinct: $d_x17"
if [ "$n_x2" -eq $n_cfg ] && [ "$n_x17" -eq $n_cfg ] && [ "$d_x2" -eq 1 ] && [ "$d_x17" -eq 1 ]; then
  echo "SPILL_PROBE PASS"
else
  echo "SPILL_PROBE FAIL (a config aborted or results diverged)"; exit 1
fi

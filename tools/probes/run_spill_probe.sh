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
n_results=$(grep -o "x2_neardup_1m result=[0-9]*" "$out" | sort -u | wc -l)
n_results17=$(grep -o "x17_semdedup_250k result=[0-9]*" "$out" | sort -u | wc -l)
echo "distinct x2 results: $n_results (expect 1), distinct x17 results: $n_results17 (expect 1)"

#!/bin/bash
# Driver for probe_spill_pressure.sc: run the identical workload at
# descending heap sizes (local mode: driver heap IS the executor heap),
# so the MEMORY_AND_DISK working set goes from fits-in-memory to
# forced-spill. PASS = every run completes, the tight runs show nonzero
# spill_disk_mb, and the result checksums are identical across heaps.
set -u
cd "$(dirname "$0")/../.."
out=/tmp/spill_probe_$$
for mem in 16g 4g 3g; do
  echo "=== heap $mem ==="
  /opt/spark/bin/spark-shell --master 'local[32]' \
    --conf spark.ui.enabled=false \
    --conf spark.sql.shuffle.partitions=32 \
    --conf spark.sql.session.timeZone=UTC \
    --driver-memory "$mem" \
    --driver-class-path target/scala-2.13/classes \
    -i tools/probes/probe_spill_pressure.sc -e ':quit' 2>&1 \
    | grep -E "PROBE_SPILL|OutOfMemory" | tee -a "$out"
done
echo "=== summary ==="
cat "$out"
n_results=$(grep -o "x2_neardup_1m result=[0-9]*" "$out" | sort -u | wc -l)
n_results17=$(grep -o "x17_semdedup_1m result=[0-9]*" "$out" | sort -u | wc -l)
echo "distinct x2 results: $n_results (expect 1), distinct x17 results: $n_results17 (expect 1)"

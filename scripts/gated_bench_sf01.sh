#!/bin/bash
# Gated sf0.1 driver-style bench: wait for a clean host window (latency probe
# + host_speed floors), then run bench.py exactly as the driver does
# (sf0.1, local[32], min-of-3) and append the JSON to BENCH/SF01_RUNS.jsonl.
# Purpose (round 4): confirm q_batch_all in a clean window (VERDICT r03 #3).
cd /root/repo
TRIES=${1:-12}
NAP=${2:-300}
for try in $(seq 1 "$TRIES"); do
  echo "=== try $try $(date +%T)"
  if ! HS=$(python scripts/host_speed.py --gate); then
    echo "host_speed DEGRADED: $HS"
    sleep "$NAP"; continue
  fi
  echo "host_speed OK: $HS"
  OUT=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>/dev/null | grep '^{' | tail -1)
  echo "$OUT" >> BENCH/SF01_RUNS.jsonl
  echo "$OUT"
  # post-gate: keep only if the window stayed clean
  if python scripts/host_speed.py --gate > /dev/null; then
    echo "RUN KEPT (pre+post gates clean)"
    exit 0
  fi
  echo "post-gate DEGRADED — run archived in SF01_RUNS.jsonl, retrying"
  sleep "$NAP"
done
echo "no clean window in $TRIES tries"
exit 1

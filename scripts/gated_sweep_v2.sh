#!/bin/bash
# Calibration-gated scaling sweep, v2. The v1 gate (scheduler-latency probe
# pre+post) catches stalls but NOT the hypervisor-side memory-bandwidth
# degradation documented in BENCH/BASELINE.md, under which probe-FAST
# windows still build 4-6x slow. v2 requires, in order:
#   1. no /tmp/graft_busy sentinel (foreground dev work owns the machine),
#   2. scheduler-latency probe FAST,
#   3. host_speed.py --gate OK (fixed-work rates incl. 2 GB/s memcpy floor),
#   4. a 200k-doc local[8] mini-build at >= MINI_FLOOR docs/s — the
#      engine's own work as the probe. Calibration (2026-08-17): the build
#      is ~7.5 s fixed cost + ~17.5k docs/s marginal, so a 50k mini tops
#      out at ~6.5k docs/s even on a clean host — 200k separates cleanly
#      (measured 9.9k clean vs 2.2-6.9k degraded, back-to-back A/B with
#      identical code; every attempt appended to BENCH/MINIBUILD.jsonl),
# then runs the full 500k sweep and re-checks gates 2+3 afterwards. A sweep
# whose post-gates fail is archived under BENCH/discarded/ and the
# committed BASELINE.md is restored.
cd /root/repo
TRIES=${1:-20}
NAP=${2:-600}
MINI_FLOOR=${MINI_FLOOR:-8000}

latency_probe() {
  python - <<'PYEOF'
import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
for _ in range(5):
    spark.range(100).count()
lat = []
for i in range(30):
    t0 = time.time(); spark.range(100).count(); lat.append(time.time()-t0)
spark.stop()
lat.sort()
p90, mx = lat[26], lat[-1]
print(f"FAST p90={p90*1e3:.0f}ms max={mx*1e3:.0f}ms" if p90 < 0.3 and mx < 1.0
      else f"SLOW p90={p90*1e3:.0f}ms max={mx*1e3:.0f}ms")
PYEOF
}

mini_build() {
  SPARK_GRAFT_REPL=40 SPARK_GRAFT_CPUS=8 SPARK_GRAFT_RUNS=1 \
    timeout 600 python bench.py 2>/dev/null | grep '^{' | tail -1
}

for try in $(seq 1 "$TRIES"); do
  echo "=== try $try $(date +%T)"
  if [[ -f /tmp/graft_busy ]]; then
    echo "skip: /tmp/graft_busy present"
    sleep "$NAP"; continue
  fi
  LAT=$(latency_probe)
  echo "latency: $LAT"
  if [[ "$LAT" != FAST* ]]; then sleep "$NAP"; continue; fi
  if ! HS=$(python scripts/host_speed.py --gate); then
    echo "host_speed DEGRADED: $HS"
    sleep "$NAP"; continue
  fi
  echo "host_speed: $HS"
  MINI=$(mini_build)
  echo "$MINI" >> BENCH/MINIBUILD.jsonl
  RATE=$(python -c "import json,sys; print(json.loads(sys.argv[1])['docs_per_sec'])" "$MINI" 2>/dev/null || echo 0)
  echo "mini-build: $RATE docs/s (floor $MINI_FLOOR)"
  if ! python -c "import sys; sys.exit(0 if float('$RATE') >= $MINI_FLOOR else 1)"; then
    sleep "$NAP"; continue
  fi
  echo ">>> gates passed — running full sweep"
  if ! python scripts/scaling_bench.py 100 /root/testdata/sf0.1 1; then
    git checkout BENCH/BASELINE.md
    echo "scaling_bench.py FAILED — restored committed file"
    sleep "$NAP"; continue
  fi
  POST_LAT=$(latency_probe)
  python scripts/host_speed.py --gate > /tmp/.hs_post.json; POST_HS=$?
  echo "post latency: $POST_LAT ; post host_speed exit: $POST_HS"
  if [[ "$POST_LAT" == FAST* && "$POST_HS" == 0 ]]; then
    echo "SWEEP KEPT (all gates clean pre+post)"
    exit 0
  fi
  mkdir -p BENCH/discarded
  DEST="BENCH/discarded/$(date +%Y%m%dT%H%M%S)_sweep.md"
  {
    echo "<!-- DISCARDED: post latency '$POST_LAT', post host_speed exit $POST_HS -->"
    cat BENCH/BASELINE.md
  } > "$DEST"
  git checkout BENCH/BASELINE.md
  echo "sweep contaminated mid-run — archived to $DEST, restored committed file"
  sleep "$NAP"
done
echo "no clean window found in $TRIES tries; committed BASELINE.md stands"
exit 3

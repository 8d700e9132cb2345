#!/bin/bash
# 2M-doc scale point (r04 VERDICT ask #4): the largest committed evidence
# was 500k docs; this runs the SAME gate battery as gated_sweep_v2.sh
# (sentinel, scheduler-latency probe, host_speed --gate, 200k mini-build
# floor), then ONE 2M-doc build+query bench at local[8] and local[32]
# (REPL=400 x sf0.1), checks the results checksum matches across
# parallelism, appends per-stage walls + a postings partition-size
# histogram to BENCH/SCALE2M.md, and re-checks the gates afterwards.
# A run whose post-gates fail is archived under BENCH/discarded/.
cd /root/repo
TRIES=${1:-12}
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
    echo "skip: /tmp/graft_busy present"; sleep "$NAP"; continue
  fi
  LAT=$(latency_probe)
  echo "latency: $LAT"
  if [[ "$LAT" != FAST* ]]; then sleep "$NAP"; continue; fi
  if ! HS=$(python scripts/host_speed.py --gate); then
    echo "host_speed DEGRADED: $HS"; sleep "$NAP"; continue
  fi
  echo "host_speed: $HS"
  MINI=$(mini_build)
  echo "$MINI" >> BENCH/MINIBUILD.jsonl
  RATE=$(python -c "import json,sys; print(json.loads(sys.argv[1])['docs_per_sec'])" "$MINI" 2>/dev/null || echo 0)
  echo "mini-build: $RATE docs/s (floor $MINI_FLOOR)"
  if ! python -c "import sys; sys.exit(0 if float('$RATE') >= $MINI_FLOOR else 1)"; then
    sleep "$NAP"; continue
  fi
  echo ">>> gates passed — running 2M point"
  if ! python scripts/scale2m_point.py; then
    echo "scale2m_point.py FAILED"; sleep "$NAP"; continue
  fi
  POST_LAT=$(latency_probe)
  python scripts/host_speed.py --gate >/dev/null; POST_HS=$?
  echo "post latency: $POST_LAT ; post host_speed exit: $POST_HS"
  if [[ "$POST_LAT" == FAST* && "$POST_HS" == 0 ]]; then
    echo "2M POINT KEPT (all gates clean pre+post)"
    exit 0
  fi
  mkdir -p BENCH/discarded
  DEST="BENCH/discarded/$(date +%Y%m%dT%H%M%S)_scale2m.md"
  mv BENCH/SCALE2M.md "$DEST" 2>/dev/null
  echo "<!-- DISCARDED: post latency '$POST_LAT', post host_speed exit $POST_HS -->" >> "$DEST"
  echo "2M point contaminated mid-run — archived to $DEST"
  sleep "$NAP"
done
echo "no clean window found in $TRIES tries"
exit 3

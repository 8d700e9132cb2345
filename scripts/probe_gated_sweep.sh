#!/bin/bash
# Retry the scaling sweep only when the host is in a fast window.
# This shared VM stalls multi-second with zero CPU/IO/mem pressure for
# hours at a time (see BENCH/BASELINE.md); timing in a degraded window
# measures the host, not the engine.
cd /root/repo
for try in 1 2 3 4 5 6; do
  echo "=== probe try $try $(date +%T)"
  P=$(python - <<'EOF'
import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
lat = []
for i in range(30):
    t0 = time.time(); spark.range(100).count(); lat.append(time.time()-t0)
spark.stop()
lat.sort()
p90, mx = lat[26], lat[-1]
print(f"FAST p90={p90*1e3:.0f}ms max={mx*1e3:.0f}ms" if p90 < 0.25 and mx < 1.0
      else f"SLOW p90={p90*1e3:.0f}ms max={mx*1e3:.0f}ms")
EOF
)
  echo "$P"
  if [[ "$P" == FAST* ]]; then
    python scripts/scaling_bench.py 100 /root/testdata/sf0.1 1
    exit $?
  fi
  sleep 480
done
echo "no fast window found; keeping previous BASELINE.md"
exit 3

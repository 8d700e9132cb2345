#!/bin/bash
# Retry the scaling sweep only when the host is in a fast window, and decide
# keep-vs-discard with an INDEPENDENT host-health probe, not the benchmark's
# own output: the latency probe is re-run AFTER the sweep, so
#   post-probe FAST → the host stayed healthy → the result is real and is
#     kept even if it is slower than before (a genuine regression must be
#     kept and flagged, not silently discarded);
#   post-probe SLOW → the host degraded mid-sweep → the result is
#     contaminated, archived under BENCH/discarded/ (in-repo, auditable),
#     and the clean-window file is restored.
# This shared VM stalls multi-second with zero CPU/IO/mem pressure for
# hours at a time (see BENCH/BASELINE.md addendum); timing in a degraded
# window measures the host, not the engine.
cd /root/repo
TRIES=${1:-6}
NAP=${2:-480}

probe() {
  python - <<'PYEOF'
import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# 5 uncounted warmup trials: the first jobs of a fresh JVM pay one-time JIT/
# codegen compilation (3-4 s trial 1 even on an idle host) — that is probe
# overhead, not host degradation. The stall signature this gate exists to
# catch is steady-state: p90 of 2.8-9.1 s across the WHOLE window
# (BENCH/BASELINE.md round-2 addendum) vs ~0.15 s p50 healthy.
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

for try in $(seq 1 "$TRIES"); do
  echo "=== probe try $try $(date +%T)"
  PRE=$(probe)
  echo "pre-probe:  $PRE"
  if [[ "$PRE" == FAST* ]]; then
    if ! python scripts/scaling_bench.py 100 /root/testdata/sf0.1 1; then
      # the bench itself failed — whatever it wrote is garbage regardless
      # of host health; restore the clean file and retry
      git checkout BENCH/BASELINE.md
      echo "scaling_bench.py FAILED — restored clean file"
      sleep "$NAP"
      continue
    fi
    POST=$(probe)
    echo "post-probe: $POST"
    B8=$(python - <<'EOF'
import re
txt = open("/root/repo/BENCH/BASELINE.md").read()
m = re.search(r"\| local\[8\] \| ([0-9.]+) ", txt)
print(m.group(1) if m else "999")
EOF
)
    echo "local[8] build wall: $B8"
    if [[ "$POST" == FAST* ]]; then
      # host stayed healthy for the whole sweep → the numbers are real
      if ! python -c "import sys; sys.exit(0 if float('$B8') < 70 else 1)"; then
        echo "SWEEP KEPT WITH REGRESSION FLAG: local[8] build $B8 s on a" \
             "probe-clean host — investigate the engine, not the VM"
      else
        echo "SWEEP KEPT"
      fi
      exit 0
    fi
    # host degraded mid-sweep → archive the contaminated run IN-REPO and
    # restore the clean-window file
    mkdir -p BENCH/discarded
    DEST="BENCH/discarded/$(date +%Y%m%dT%H%M%S)_sweep.md"
    {
      echo "<!-- DISCARDED: post-sweep probe '$POST' (pre '$PRE');"
      echo "     local[8] build wall $B8 s — host degraded mid-sweep -->"
      cat BENCH/BASELINE.md
    } > "$DEST"
    git checkout BENCH/BASELINE.md
    echo "sweep contaminated (post-probe SLOW) — archived to $DEST," \
         "restored clean file"
  fi
  sleep "$NAP"
done
echo "no fast window found; keeping previous BASELINE.md"
exit 3

#!/bin/bash
# Run the pure-Spark scaling probes (scripts/cluster_scalecheck.py) on a
# standalone cluster with N separate executor JVMs — the control experiment
# behind BENCH/CLUSTER.md's attribution of the multi-executor anti-scaling
# to the single-host emulation (not the engine).
#
# Usage: scripts/cluster_scalecheck.sh N_EXECUTORS [CORES_PER_EXEC]
#   scripts/cluster_scalecheck.sh 2      # 2 JVMs x 2 cores
#   scripts/cluster_scalecheck.sh 8      # 8 JVMs x 2 cores
#   scripts/cluster_scalecheck.sh 2 8    # 2 JVMs x 8 cores (same 16 cores)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_EXEC="${1:?usage: cluster_scalecheck.sh N_EXECUTORS [CORES_PER_EXEC]}"
CORES_PER_EXEC="${2:-2}"

export SPARK_HOME=/opt/spark
export SPARK_LOG_DIR="$(mktemp -d /tmp/spark_sc_logs.XXXXXX)"
export SPARK_PID_DIR="$SPARK_LOG_DIR"
export PYSPARK_PYTHON="$(command -v python)"
export PYSPARK_DRIVER_PYTHON="$PYSPARK_PYTHON"
export SPARK_MASTER_HOST=127.0.0.1
export SPARK_MASTER_PORT=7077
export SPARK_MASTER_WEBUI_PORT=8089
export SPARK_WORKER_WEBUI_PORT=8090
MASTER_URL="spark://127.0.0.1:7077"

cleanup() {
  "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
  rm -rf "$SPARK_LOG_DIR"
}
trap cleanup EXIT

"$SPARK_HOME/sbin/start-master.sh" >/dev/null
SPARK_WORKER_CORES=$((CORES_PER_EXEC * N_EXEC)) \
SPARK_WORKER_MEMORY=$((5 * N_EXEC * CORES_PER_EXEC / 2))g \
  "$SPARK_HOME/sbin/start-worker.sh" "$MASTER_URL" >/dev/null
sleep 3

echo "cluster=standalone n_executors=$N_EXEC cores_per_exec=$CORES_PER_EXEC"
cd "$REPO"
SPARK_GRAFT_MASTER="$MASTER_URL" \
SCALECHECK_EXECUTORS="$N_EXEC" \
SPARK_GRAFT_CPUS=$((CORES_PER_EXEC * N_EXEC)) \
"$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER_URL" \
  --deploy-mode client \
  --conf spark.executor.cores=$CORES_PER_EXEC \
  --conf spark.executor.memory=$((2 * CORES_PER_EXEC))g \
  --conf spark.cores.max=$((CORES_PER_EXEC * N_EXEC)) \
  --conf spark.driver.memory=8g \
  --conf spark.ui.enabled=false \
  --conf spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=$CORES_PER_EXEC \
  --conf spark.driver.extraJavaOptions=-XX:ActiveProcessorCount=4 \
  --conf spark.locality.wait=0s \
  scripts/cluster_scalecheck.py 2>/dev/null

#!/bin/bash
# Run bench.py against a REAL Spark standalone cluster with N separate
# executor JVMs (north_rule deployment shape: spark-submit --py-files on a
# multi-executor cluster). One master + one worker daemon are started
# locally; spark.cores.max / spark.executor.cores carve the worker into N
# executor processes, each with its own heap and Python workers — the
# in-sandbox stand-in for N cluster nodes that exercises the real
# executor-boundary code paths (task serialization, Arrow socket transfer,
# shuffle over netty, broadcast distribution) that local[K] threads skip.
#
# Usage: scripts/cluster_bench.sh N_EXECUTORS [repl] [sf_dir] [runs]
# Prints bench.py's one JSON line on stdout (plus a cluster= prefix line).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_EXEC="${1:?usage: cluster_bench.sh N_EXECUTORS [repl] [sf_dir] [runs]}"
REPL="${2:-1}"
SF_DIR="${3:-/root/testdata/sf0.1}"
RUNS="${4:-2}"
CORES_PER_EXEC=2
MEM_PER_EXEC=4g

export SPARK_HOME=/opt/spark
export SPARK_LOG_DIR="$(mktemp -d /tmp/spark_cluster_logs.XXXXXX)"
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
SPARK_WORKER_MEMORY=$((5 * N_EXEC))g \
  "$SPARK_HOME/sbin/start-worker.sh" "$MASTER_URL" >/dev/null
sleep 3

ZIP="$SPARK_LOG_DIR/tantiny_spark.zip"
( cd "$REPO" && zip -qr "$ZIP" tantiny_spark -x '*__pycache__*' )

echo "cluster=standalone n_executors=$N_EXEC cores_per_exec=$CORES_PER_EXEC"
cd "$REPO"
SPARK_GRAFT_MASTER="$MASTER_URL" \
SPARK_GRAFT_CPUS=$((CORES_PER_EXEC * N_EXEC)) \
SPARK_GRAFT_REPL="$REPL" \
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_RUNS="$RUNS" \
"$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER_URL" \
  --deploy-mode client \
  --py-files "$ZIP" \
  --conf spark.executor.cores=$CORES_PER_EXEC \
  --conf spark.executor.memory=$MEM_PER_EXEC \
  --conf spark.cores.max=$((CORES_PER_EXEC * N_EXEC)) \
  --conf spark.driver.memory=8g \
  --conf spark.ui.enabled=false \
  --conf spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=$CORES_PER_EXEC \
  --conf spark.driver.extraJavaOptions=-XX:ActiveProcessorCount=4 \
  --conf spark.locality.wait=0s \
  ${EXTRA_CONF:-} \
  bench.py 2>/dev/null | grep '^{'
# ^ faithful-emulation configs, not tuning tricks:
#   - ActiveProcessorCount=executor.cores: on a real cluster every executor
#     JVM sees only its container's cores (cgroup limits under YARN/K8s) and
#     sizes GC/JIT/netty pools accordingly. Carving one 32-core host into
#     8 standalone executors WITHOUT this makes every JVM size its pools to
#     all 32 cores (8x ~23 G1 GC threads + 8x4 JIT threads -> scheduler
#     thrash): measured 4x build slowdown vs with the flag.
#   - locality.wait=0: all emulated executors live on one host, so block
#     locality preferences are spurious here and each one costs up to 3 s
#     of idle scheduler delay per task wave (real clusters keep the default
#     because locality saves actual network reads).

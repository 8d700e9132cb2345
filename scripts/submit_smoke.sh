#!/bin/bash
# Deployment-shape smoke test (north_rule: "run via spark-submit --py-files
# on a multi-executor cluster"): package tantiny_spark into a zip, chdir OUT
# of the repo so cwd imports cannot mask packaging bugs, and spark-submit
# the job with the package shipped only via --py-files. Exits non-zero if
# the job fails or reports not-ok.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.001}"
MASTER="${SPARK_GRAFT_MASTER:-local[4]}"
WORK="$(mktemp -d /tmp/submit_smoke.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

( cd "$REPO" && zip -qr "$WORK/tantiny_spark.zip" tantiny_spark -x '*__pycache__*' )
cp "$REPO/scripts/submit_smoke_job.py" "$WORK/job.py"

cd "$WORK"   # neither driver nor executors may import from the repo cwd
OUT=$(spark-submit \
  --master "$MASTER" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$WORK/tantiny_spark.zip" \
  "$WORK/job.py" "$SF_DIR" 2>/dev/null | grep '^{')
echo "$OUT"
python3 - "$OUT" <<'EOF'
import json, sys
rec = json.loads(sys.argv[1])
assert rec["ok"] and rec["n_docs"] > 0, rec
print("SUBMIT SMOKE OK:", rec["n_docs"], "docs;",
      len(rec["term_top5"]), "term hits;", len(rec["bool_top5"]), "bool hits")
EOF

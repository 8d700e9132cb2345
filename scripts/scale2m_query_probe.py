"""Query-side parallelism probe for the 2M-doc scale point.

The gated 2M run (BENCH/SCALE2M.md) showed three query stages 4-16x
slower at local[32] than local[8] (q_range_date 14.4 vs 1.3 s,
q_string_term 21.4 vs 5.9 s, q_smart 9.5 vs 3.7 s) with SPARK_GRAFT_RUNS=1
— single walls on a host documented to stall multi-second and to thrash
its memory bus beyond ~16 processes. This probe separates "engine
pathology that scales with parallelism" from "host noise":

  1. build the same 2M-doc index ONCE at local[8] (the layout is
     parallelism-independent data; queries never re-shuffle it),
  2. open it in a fresh local[8] session and a fresh local[32] session,
  3. time the outlier queries min-of-N in each (min over repeats is the
     steady-state estimate; a stall inflates one wall, not all N),
  4. print one JSON line with both and the per-run raw walls.

If min-of-N at local[32] lands in the local[8] band, the SCALE2M tail was
stall noise. If it stays multiples slower, there is a real per-partition
or per-thread cost in the query path to hunt down.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IDX = "/tmp/tantiny_scale2m_probe_idx"
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "5"))
REPL = int(os.environ.get("SPARK_GRAFT_REPL", "400"))


def session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scale2m-query-probe-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def build_once():
    if os.path.exists(os.path.join(IDX, "manifest.json")):
        return  # reuse an existing probe index (idempotent re-runs)
    shutil.rmtree(IDX, ignore_errors=True)
    sys.argv = [sys.argv[0]]
    import bench  # noqa: F401 — reuse the bench corpus/schema exactly

    spark = session(8)
    spark.sparkContext.setLogLevel("ERROR")
    from tantiny_spark.index import Index

    src = bench.corpus(spark, "/root/testdata/sf0.1", REPL)
    t0 = time.time()
    ix = Index(spark, IDX, bench.build_schema())
    ix.add_dataframe(src)
    ix.reload()
    print(f"build: {time.time() - t0:.1f}s n_docs={src.count()}", file=sys.stderr)
    spark.stop()


def probe(cpus: int) -> dict:
    from datetime import datetime

    from tantiny_spark.index import Index

    spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ix = Index(spark, IDX)  # schema loads from the persisted snapshot
    ix.search(ix.all_query(), limit=1)  # snapshot warm-up, untimed
    suite = [
        ("range_date", ix.range_query("warc_ts", (datetime(2026, 1, 1), datetime(2027, 1, 1)))),
        ("string_term", ix.term_query("lang", "en")),
        ("smart", ix.smart_query(["text"], "spark merg")),
        ("term", ix.term_query("text", "spark")),
    ]
    out = {}
    for name, q in suite:
        walls = []
        for _ in range(RUNS):
            ix._query_cache.clear()  # time the plan, not the LRU hit
            t0 = time.time()
            ix.search(q, limit=10)
            walls.append(round(time.time() - t0, 3))
        out[name] = {"min": min(walls), "walls": walls}
    spark.stop()
    return out


def main():
    build_once()
    r8 = probe(8)
    r32 = probe(32)
    report = {"n_runs": RUNS, "repl": REPL, "local8": r8, "local32": r32}
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH", "SCALE2M_QUERY_PROBE.json"), "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()

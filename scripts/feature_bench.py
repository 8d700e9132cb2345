"""Latency of the round-4 feature operators at the 500k-doc scale point.

Builds ONE index over the bench corpus shape (bench.py's html→text chain,
×SPARK_GRAFT_REPL replication) plus an n_chars fast field, then times each
round-4 feature query top-10 (min of SPARK_GRAFT_RUNS runs, like bench.py):
field collapsing, composite-agg page (with a mid-stream after cursor),
two-phase rescore, function_score, term_vector, and sessionization over the
×repl-replicated events table.

Prints ONE JSON line; append to BENCH/FEATURES.jsonl. Run ONLY in a
host-gated window (scripts/host_speed.py first — see BENCH/BASELINE.md's
gating protocol); never concurrently with another Spark job.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 8), SPARK_GRAFT_REPL (default 100 → 500k docs at sf0.1),
SPARK_GRAFT_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import bench  # noqa: E402  (corpus + input shape live in the headline bench)
from tantiny_spark.index import Index  # noqa: E402
from tantiny_spark.pipeline import sessions  # noqa: E402
from tantiny_spark.schema import IndexSchema  # noqa: E402


def feature_schema() -> IndexSchema:
    s = IndexSchema()
    s.id("url")
    s.text("text")
    s.string("lang")
    s.integer("n_chars")
    s.date("warc_ts")
    return s


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    repl = int(os.environ.get("SPARK_GRAFT_REPL", "100"))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "3")))

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tantiny-spark-feature-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="tantiny_featbench_")
    out: dict = {}
    try:
        src = bench.corpus(spark, sf_dir, repl).withColumn(
            "n_chars", F.length("text").cast("long")
        )
        # derive n_docs from the base parquet row count — counting src would
        # run the whole html→text chain once extra
        base_rows = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        n_docs = base_rows * repl

        t0 = time.time()
        ix = Index(spark, os.path.join(tmp, "idx"), feature_schema())
        ix.add_dataframe(src)
        ix.reload()
        build_s = round(time.time() - t0, 3)
        print(f"# build {build_s}s", file=sys.stderr, flush=True)

        def timed(name, fn):
            walls = []
            for _ in range(runs):
                t = time.time()
                rows = fn()
                walls.append(time.time() - t)
            out[name] = round(min(walls), 3)
            print(f"# {name} {out[name]}s {walls}", file=sys.stderr, flush=True)
            return rows

        q = ix.term_query("text", "spark")
        timed("collapse_by_lang", lambda: ix.search_collapse(
            q, "lang", limit=10).collect())
        timed("composite_page_after_cursor", lambda: ix.aggregate({
            "page": {"composite": {
                "sources": [
                    {"lg": {"terms": {"field": "lang"}}},
                    {"cb": {"histogram": {"field": "n_chars", "interval": 100}}},
                ],
                "size": 100, "after": {"lg": "de", "cb": 0.0},
            }, "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}
        }).collect())
        timed("rescore_phrase_window100", lambda: ix.rescore(
            q, ix.phrase_query("text", "batch batch"),
            window_size=100, weight=2.0, limit=10).collect())
        timed("function_score_log1p", lambda: ix.function_score(
            q, "n_chars", modifier="log1p", limit=10).collect())
        timed("term_vector", lambda: ix.term_vector(
            "https://site7.example/page/7-0", "text").collect())

        # events replicate by distinct-user offset; cap at x10 — the base
        # sf0.1 events table is already ~1M rows and sessionization cost is
        # linear in events, so x10 (~10M) is a sufficient scale probe
        ev_repl = min(repl, 10)
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ev_base = ev.count()
        if ev_repl > 1:
            ev = ev.select(
                "*",
                F.explode(F.sequence(F.lit(0), F.lit(ev_repl - 1))).alias("rep"),
            ).select(
                (F.col("user_id") + F.col("rep") * F.lit(10_000_000))
                .alias("user_id"),
                "ts", "value",
            )
        n_events = ev_base * ev_repl
        timed("sessionize_30min", lambda: sessions.sessionize(
            ev, gap="30 minutes").count())

        print(json.dumps({
            "metric": "round4_feature_suite",
            "unit": "sec",
            "sf": sf_dir.rstrip("/").split("sf")[-1],
            "n_docs": n_docs,
            "n_events": n_events,
            "cpus": cpus,
            "repl": repl,
            "timing_runs": runs,
            "index_build_sec": build_s,
            "features": out,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

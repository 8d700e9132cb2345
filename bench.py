"""Headline benchmark: distributed inverted-index build + BM25 query suite.

Reads documents from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
maps them onto the Common-Crawl-style input shape
(url, warc_ts, html, text, lang), builds the full index (docs/postings/dict/
stats segment tables) with tantiny_spark, then runs the reference-derived
query suite (term / boolean / phrase / prefix / fuzzy / smart / range /
facet / negation) top-10 each.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 8 — measured sweet spot on this
                       shared 32-core box: every pandas-UDF stage runs N JVM
                       task threads + N Arrow Python workers, and beyond ~16
                       total processes the single shared heap/memory bus
                       thrashes: 500k-doc build = 39 s at local[8] vs 87 s at
                       local[16] vs 268 s at local[32]. Real executors each
                       own their cores/memory, so a cluster does not hit
                       this; see BENCH/BASELINE.md.)
  SPARK_GRAFT_REPL     deterministic corpus replication factor (default 1) —
                       used by the scaling study to get a build long enough
                       to measure (BENCH/BASELINE.md)
  SPARK_GRAFT_RUNS     repeats per timed section, min reported (default 3).
                       This VM stalls multi-second with zero CPU/IO/memory
                       pressure (PSI-verified); min-of-N is the steady-state
                       estimate a dedicated cluster would measure. Raw build
                       walls are reported in build_runs_sec; builds longer
                       than 60 s are never repeated. A tiny untimed 64-doc
                       build runs first so JVM codegen + Arrow worker fork
                       warm-up never lands inside the first timed run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# numpy madvises MADV_HUGEPAGE on every >=4 MB buffer; on hosts where THP
# faults are slow (this VM measured ~15 ms per 2 MB fault on 2026-08-19 —
# scripts/host_speed.py thp_fault_ms_per_2mb — halving build throughput),
# that torpedoes every fresh-buffer Arrow/numpy kernel. Set BEFORE the JVM
# launches so executor Python workers inherit it; on a real cluster the
# same knob ships as spark.executorEnv.NUMPY_MADVISE_HUGEPAGE=0.
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tantiny_spark.index import Index  # noqa: E402
from tantiny_spark.pipeline import webtext  # noqa: E402
from tantiny_spark.schema import IndexSchema  # noqa: E402


def corpus(spark, sf_dir: str, repl: int):
    """documents.parquet → input_hint shape (url, warc_ts, html, text, lang),
    deterministically replicated ×repl (distinct urls, same Zipfian text)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # The sf* corpus is ONE small parquet file = one input split, which would
    # serialize every pass over the derived html/extraction chain below into
    # a single task (a 100 TB corpus has thousands of splits — many-split IS
    # the realistic shape). Spread the base rows across the cores BEFORE the
    # expensive derived columns exist; this shuffles only the tiny raw rows.
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    if repl > 1:
        docs = docs.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("rep")
        )
    else:
        docs = docs.withColumn("rep", F.lit(0))
    pages = docs.select(
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example/page/"), F.col("doc_id").cast("string"),
            F.lit("-"), F.col("rep").cast("string"),
        ).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        webtext.wrap_html("text").alias("html"),
        F.col("lang"),
    )
    # the index builds from the page body, not a side-channel text column:
    # html→text runs the pure-JVM extraction chain (pipeline/webtext.py),
    # whose output is byte-identical per url (tests/test_webtext.py)
    return pages.withColumn("text", webtext.extracted_text("html"))


def build_schema() -> IndexSchema:
    s = IndexSchema()
    s.id("url")
    s.text("text")
    s.string("lang")
    s.date("warc_ts")
    return s


QUERY_SUITE = [
    ("term", lambda ix: ix.term_query("text", "spark")),
    ("term_rare", lambda ix: ix.term_query("text", "vector")),
    ("bool_and", lambda ix: ix.term_query("text", "spark") & ix.term_query("text", "merge")),
    ("bool_or", lambda ix: ix.term_query("text", "hash") | ix.term_query("text", "window")),
    ("bool_not", lambda ix: ~ix.term_query("text", "spark")),
    ("phrase", lambda ix: ix.phrase_query("text", "batch batch")),
    ("prefix", lambda ix: ix.prefix_query("text", "sp")),
    ("fuzzy", lambda ix: ix.fuzzy_term_query("text", "spork", 1)),
    ("smart", lambda ix: ix.smart_query(["text"], "spark merg")),
    ("range_date", lambda ix: ix.range_query("warc_ts", __import__("datetime").datetime(2026, 1, 1), )),
    ("facet_lang", lambda ix: ix.term_query("lang", "en")),
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    repl = int(os.environ.get("SPARK_GRAFT_REPL", "1"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # SPARK_GRAFT_MASTER overrides local[N] — e.g. spark://host:7077 when the
    # bench runs against a standalone cluster via spark-submit --py-files
    # (scripts/cluster_bench.sh); SPARK_GRAFT_CPUS then sizes shuffle
    # partitions only.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    spark = (
        SparkSession.builder.master(master)
        .appName("tantiny-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    tmp = tempfile.mkdtemp(prefix="tantiny_bench_")
    timings: dict[str, float] = {}
    try:
        src = corpus(spark, sf_dir, repl)
        n_docs = src.count()

        # this shared VM exhibits multi-second scheduler stalls with zero
        # CPU/IO/memory pressure (a trivial spark.range(100).count() can
        # take 3.7 s 1 time in 60); every timed section therefore runs up
        # to `runs` times and reports the MIN — the steady-state estimate a
        # dedicated cluster would measure. Raw walls ship in build_runs_sec
        # so nothing is hidden.
        # untimed warm-up: a 64-doc build forks the Arrow Python workers and
        # JIT-compiles every codegen stage in the build path once, so the
        # first timed run measures the engine, not JVM/worker warm-up
        warm = Index(spark, os.path.join(tmp, "warm"), build_schema())
        warm.add_dataframe(src.limit(64))
        warm.reload()
        warm.search(warm.all_query(), limit=1)

        build_walls = []
        index = None
        for r in range(max(1, runs)):
            t0 = time.time()
            ix_r = Index(spark, os.path.join(tmp, f"idx{r}"), build_schema())
            ix_r.add_dataframe(src)
            ix_r.reload()
            build_walls.append(time.time() - t0)
            if index is None:
                index = ix_r
            if build_walls[-1] >= 60.0:
                break  # big build: don't double a long wall for variance
        build_sec = min(build_walls)
        timings["index_build"] = round(build_sec, 3)

        # warm the snapshot once (materializes the persisted docs/dict/stats
        # caches — the reader-open cost, paid once per snapshot, not a
        # per-query cost), then time queries
        index.search(index.all_query(), limit=1)
        from datetime import datetime

        suite = [
            ("term", index.term_query("text", "spark")),
            ("term2", index.term_query("text", "vector")),
            ("bool_and", index.term_query("text", "spark") & index.term_query("text", "merge")),
            ("bool_or", index.term_query("text", "hash") | index.term_query("text", "window")),
            ("bool_not", ~index.term_query("text", "spark")),
            ("phrase", index.phrase_query("text", "batch batch")),
            ("prefix", index.prefix_query("text", "sp")),
            ("fuzzy", index.fuzzy_term_query("text", "spork", 1)),
            ("smart", index.smart_query(["text"], "spark merg")),
            ("range_date", index.range_query("warc_ts", (datetime(2026, 1, 1), datetime(2027, 1, 1)))),
            ("string_term", index.term_query("lang", "en")),
        ]
        q_total = 0.0
        import hashlib

        result_hash = hashlib.sha256()
        for name, q in suite:
            best, hits = None, None
            for _ in range(max(1, runs)):
                tq = time.time()
                hits_r = index.search(q, limit=10)
                dt = time.time() - tq
                if best is None or dt < best:
                    best, hits = dt, hits_r
            timings[f"q_{name}"] = round(best, 3)
            q_total += best
            result_hash.update((name + ":" + ",".join(hits)).encode())

        # batched execution: the cluster-throughput number (one job amortizes
        # scheduling across the whole query batch)
        batch_sec, batch_results = None, None
        for _ in range(max(1, runs)):
            tb = time.time()
            batch_r = index.search_many({n: q for n, q in suite}, limit=10)
            dt = time.time() - tb
            if batch_sec is None or dt < batch_sec:
                batch_sec, batch_results = dt, batch_r
        timings["q_batch_all"] = round(batch_sec, 3)
        for name, _ in suite:
            result_hash.update(("batch:" + name + ":" + ",".join(batch_results[name])).encode())

        total = build_sec + q_total
        print(
            json.dumps(
                {
                    "metric": "index_build_plus_bm25_query_suite_wall_sec",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "n_docs": n_docs,
                    "docs_per_sec": round(n_docs / build_sec, 1),
                    "queries_per_sec": round(len(suite) / q_total, 2),
                    "batched_queries_per_sec": round(len(suite) / batch_sec, 2),
                    "cpus": cpus,
                    "repl": repl,
                    "timing_runs": runs,
                    "build_runs_sec": [round(w, 3) for w in build_walls],
                    # identical across parallelism levels = determinism evidence
                    "results_checksum": result_hash.hexdigest()[:16],
                }
            )
        )
    finally:
        keep = os.environ.get("SPARK_GRAFT_KEEP_INDEX")
        if keep:
            # scale studies keep one built index for post-hoc layout
            # inspection (partition-size histograms, file counts)
            shutil.rmtree(keep, ignore_errors=True)
            shutil.move(os.path.join(tmp, "idx0"), keep)
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

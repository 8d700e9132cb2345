"""One 2M-doc scale point (r04 VERDICT ask #4): bench.py at REPL=400 x
sf0.1 (= 2,000,000 docs) at local[8] and local[32], checksum equality
across parallelism, per-stage walls, and a postings partition-size
histogram of the built index. Writes BENCH/SCALE2M.md + SCALE2M.json.

Run ONLY through scripts/gated_scale2m.sh — the gate battery decides
whether the host window is clean enough for the numbers to mean anything.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KEEP = "/tmp/tantiny_scale2m_idx"


def run_bench(cpus: int, keep_index: bool = False) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REPL="400",
        SPARK_GRAFT_RUNS="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
    )
    if keep_index:
        env["SPARK_GRAFT_KEEP_INDEX"] = KEEP
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"bench.py failed at local[{cpus}]")
    return json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )


def postings_histogram() -> dict:
    """Partition/file-size stats of the kept index's postings table —
    the skew evidence at 2M docs (Zipf head terms split by doc_id in the
    layout sort key, so no partition should dwarf the median)."""
    seg_root = os.path.join(KEEP, "segments")
    sizes = sorted(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(seg_root)
        for f in fs
        if f.endswith(".parquet") and "postings" in dp
    )
    if not sizes:
        return {"files": 0}
    import statistics

    return {
        "files": len(sizes),
        "min_bytes": sizes[0],
        "p50_bytes": sizes[len(sizes) // 2],
        "max_bytes": sizes[-1],
        "total_mb": round(sum(sizes) / 1e6, 1),
        "max_over_median": round(sizes[-1] / max(sizes[len(sizes) // 2], 1), 2),
        "stdev_over_mean": round(
            statistics.pstdev(sizes) / max(statistics.mean(sizes), 1), 3
        ),
    }


def main():
    t0 = time.time()
    r8 = run_bench(8, keep_index=True)
    hist = postings_histogram()
    r32 = run_bench(32)
    ck_match = r8["results_checksum"] == r32["results_checksum"]
    # local-mode caveat (BENCH/BASELINE.md): beyond ~16 total processes the
    # shared heap/memory bus of this 32-core VM thrashes, so local[32] is
    # NOT expected to beat local[8] here the way 4x real executors would;
    # the committed N->4N efficiency evidence uses local[2]->local[8].
    report = {
        "n_docs": r8["n_docs"],
        "local8": {
            "build_sec": r8["queries"]["index_build"],
            "docs_per_sec": r8["docs_per_sec"],
            "queries_per_sec": r8["queries_per_sec"],
            "batched_queries_per_sec": r8["batched_queries_per_sec"],
            "per_stage": r8["queries"],
        },
        "local32": {
            "build_sec": r32["queries"]["index_build"],
            "docs_per_sec": r32["docs_per_sec"],
            "queries_per_sec": r32["queries_per_sec"],
            "batched_queries_per_sec": r32["batched_queries_per_sec"],
            "per_stage": r32["queries"],
        },
        "checksum_match": ck_match,
        "checksum": r8["results_checksum"],
        "postings_partition_histogram": hist,
        "wall_total_sec": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALE2M.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    with open(os.path.join(REPO, "BENCH", "SCALE2M.md"), "w") as fh:
        fh.write(
            "# 2M-doc scale point (gated; scripts/gated_scale2m.sh)\n\n"
            f"- corpus: {r8['n_docs']:,} docs (sf0.1 x REPL=400), "
            "deterministic\n"
            f"- local[8]: build {r8['queries']['index_build']} s "
            f"({r8['docs_per_sec']:,.0f} docs/s), "
            f"{r8['queries_per_sec']} q/s serial, "
            f"{r8['batched_queries_per_sec']} q/s batched\n"
            f"- local[32]: build {r32['queries']['index_build']} s "
            f"({r32['docs_per_sec']:,.0f} docs/s), "
            f"{r32['queries_per_sec']} q/s serial, "
            f"{r32['batched_queries_per_sec']} q/s batched\n"
            f"- results checksum match across parallelism: **{ck_match}** "
            f"(`{r8['results_checksum']}`)\n"
            f"- postings partition histogram: {json.dumps(hist)}\n\n"
            "Per-stage walls (seconds):\n\n"
            "| stage | local[8] | local[32] |\n| --- | --- | --- |\n"
            + "".join(
                f"| {k} | {r8['queries'][k]} | {r32['queries'].get(k, '-')} |\n"
                for k in r8["queries"]
            )
            + "\nLocal-mode caveat: beyond ~16 total processes this shared "
            "32-core VM's memory bus thrashes (BENCH/BASELINE.md), so "
            "local[32] vs local[8] here is an oversubscription check, not "
            "the N->4N executor-scaling evidence (that uses "
            "local[2]->local[8] on dedicated-core headroom).\n"
        )
    print(json.dumps(report))
    import shutil

    shutil.rmtree(KEEP, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Self-check harness replicating the driver's CORRECTNESS comparison:
run each __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at the given sf dir, compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
normalized via repr of rounded values).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def normalize(value):
    if value is None:
        return "NULL"
    if isinstance(value, float):
        return f"{value:.9g}"
    if isinstance(value, bool):
        return str(int(value))
    return str(value)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(normalize(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:22s} spark error: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok*   {name:22s} rows={len(srows):6d} (rows-only, no oracle) {time.time()-t0:5.1f}s")
            continue
        try:
            rel = con.sql(sql)
            dcols = rel.columns
            drows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:22s} duckdb error: {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = table_hash(scols, srows)
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "ok" if (ok_count and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status:5s} {name:22s} rows={len(srows):6d}/{len(drows):6d} "
            f"cols={'=' if ok_cols else scols + dcols} hash={'=' if ok_hash else sh + '!=' + dh} "
            f"{time.time()-t0:5.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_cols:
                # show first differing rows for debugging
                s_set = {tuple(normalize(v) for v in r) for r in srows}
                d_set = {tuple(normalize(v) for v in r) for r in drows}
                print("   spark-only:", list(s_set - d_set)[:3])
                print("   duck-only :", list(d_set - s_set)[:3])

    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

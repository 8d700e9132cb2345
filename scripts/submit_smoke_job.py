"""spark-submit smoke job: exercises the engine with tantiny_spark shipped
ONLY via --py-files (north_rule deployment shape: `spark-submit --py-files
tantiny_spark.zip` on a multi-executor cluster).

Run through scripts/submit_smoke.sh, which zips the package, chdirs OUT of
the repo (so neither driver nor executors can import from cwd) and submits.
Builds a real index from sf0.001 documents, runs a term + a boolean query,
and prints one JSON line with the results.
"""

import json
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # the import must resolve from the --py-files zip on driver AND workers
    from tantiny_spark.index import Index
    from tantiny_spark.schema import IndexSchema

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    schema = IndexSchema()
    schema.id("doc_id")
    schema.text("text")
    schema.string("lang")

    ix = Index(spark, tempfile.mkdtemp(prefix="submit_smoke_") + "/idx", schema)
    ix.add_dataframe(docs.select("doc_id", "text", "lang"))
    ix.reload()

    term = ix.search(ix.term_query("text", "spark"), limit=5)
    both = ix.search(
        ix.term_query("text", "spark") & ix.term_query("text", "merge"), limit=5
    )
    n = docs.count()
    print(json.dumps({
        "ok": bool(term) and bool(both),
        "n_docs": n,
        "term_top5": term,
        "bool_top5": both,
    }))


if __name__ == "__main__":
    main()

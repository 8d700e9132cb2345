"""Resumability: kill the build mid-way, re-run, get the identical index
(FIXTURES.md §5 resume fixture / north_rule)."""

import json
import os

import pytest

from tantiny_spark.index import Index
from tantiny_spark.resume import resumable_build
from tantiny_spark.schema import IndexSchema


def make_df(spark, n=200):
    rows = [
        (f"doc{i:04d}", f"word{i % 17} common word{i % 5} text body {i % 3}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id string, text string")


def schema():
    s = IndexSchema()
    s.text("text")
    return s


def test_kill_and_resume_identical(spark, tmp_path):
    df = make_df(spark)

    # full build (the expected outcome)
    full = resumable_build(spark, df, schema(), str(tmp_path / "full"), num_shards=4)

    # crashed build: dies after 2 of 4 shard checkpoints
    crash_path = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        resumable_build(spark, df, schema(), crash_path, num_shards=4, fail_after=2)
    # no commit happened: a reader sees an empty index, never a partial one
    assert not os.path.exists(os.path.join(crash_path, "HEAD"))
    done = os.listdir(os.path.join(crash_path, "checkpoints"))
    assert len(done) == 2

    # resume: completes the remaining shards only
    resumed = resumable_build(spark, df, schema(), crash_path, num_shards=4)

    # lineage checksums identical shard-by-shard
    key = lambda rec: rec["shard"]  # noqa: E731
    for a, b in zip(sorted(full["lineage"], key=key), sorted(resumed["lineage"], key=key)):
        assert (a["docs_rows"], a["docs_crc"], a["postings_rows"], a["postings_crc"]) == (
            b["docs_rows"], b["docs_crc"], b["postings_rows"], b["postings_crc"]
        )

    # identical search behavior
    ia = Index(spark, str(tmp_path / "full"))
    ib = Index(spark, crash_path)
    for q in ["common", "word3", "body"]:
        assert ia.search(q, limit=20) == ib.search(q, limit=20)

    # manifest records lineage + metrics
    manifest = json.load(
        open(os.path.join(crash_path, "snapshots", "v000001.json"))
    )
    assert len(manifest["lineage"]) == 4
    assert all("wall_sec" in rec and "postings_crc" in rec for rec in manifest["lineage"])

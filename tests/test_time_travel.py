"""Snapshot time travel (reload(version=), versions()) and Iceberg-style
expire_snapshots — the manifest-log lifecycle the storage design implies:
every commit is an immutable version until explicitly expired."""

import os

import pytest

from tantiny_spark.index import Index, IndexWriterBusyError
from tantiny_spark.schema import IndexSchema


def _three_commits(spark, path):
    s = IndexSchema()
    s.text("t")
    ix = Index(spark, path, s)
    ix.add({"id": "1", "t": "alpha one"})
    ix.add({"id": "2", "t": "alpha two"})
    ix.add({"id": "3", "t": "alpha three"})
    ix.reload()
    return ix


def test_versions_and_time_travel(spark, tmp_path):
    ix = _three_commits(spark, str(tmp_path / "tt"))
    vs = ix.versions()
    assert [v["version"] for v in vs] == [1, 2, 3]
    assert all(v["committed_at"] for v in vs)
    assert sorted(ix.search("alpha")) == ["1", "2", "3"]
    # pin the reader at each historical commit
    ix.reload(version=1)
    assert ix.search("alpha") == ["1"]
    ix.reload(version=2)
    assert sorted(ix.search("alpha")) == ["1", "2"]
    ix.reload()  # back to HEAD
    assert sorted(ix.search("alpha")) == ["1", "2", "3"]
    with pytest.raises(ValueError):
        ix.reload(version=9)
    with pytest.raises(ValueError):
        ix.reload(version=-1)


def test_time_travel_sees_pre_delete_and_pre_merge_state(spark, tmp_path):
    ix = _three_commits(spark, str(tmp_path / "ttm"))
    ix.delete("2")          # v4: tombstone
    ix.reload()
    assert sorted(ix.search("alpha")) == ["1", "3"]
    ix.merge_segments()     # v5: tombstone physically applied
    ix.reload()
    assert sorted(ix.search("alpha")) == ["1", "3"]
    # the pre-delete version still reads the deleted doc
    ix.reload(version=3)
    assert sorted(ix.search("alpha")) == ["1", "2", "3"]
    # writes stack on HEAD even while the reader is pinned in the past
    ix.add({"id": "4", "t": "alpha four"})
    ix.reload()
    assert sorted(ix.search("alpha")) == ["1", "3", "4"]


def test_expire_snapshots_drops_manifests_and_dead_segments(spark, tmp_path):
    path = str(tmp_path / "exp")
    ix = _three_commits(spark, path)
    ix.merge_segments()  # v4 references ONE new segment; v1-v3 segs go dead
    ix.reload()
    segroot = os.path.join(path, "segments")
    assert len(os.listdir(segroot)) == 4  # 3 commit segments + merged
    report = ix.expire_snapshots(keep_last=1)
    assert report["expired_versions"] == [1, 2, 3]
    assert report["kept_versions"] == [4]
    assert len(report["deleted_segments"]) == 3
    assert [v["version"] for v in ix.versions()] == [4]
    assert len(os.listdir(segroot)) == 1  # only the merged segment remains
    # HEAD still reads fine, expired versions refuse loudly
    assert sorted(ix.search("alpha")) == ["1", "2", "3"]
    with pytest.raises(ValueError, match="expired"):
        ix.reload(version=2)


def test_expire_keeps_segments_shared_with_kept_versions(spark, tmp_path):
    path = str(tmp_path / "shared")
    ix = _three_commits(spark, path)  # v3 references ALL three segments
    report = ix.expire_snapshots(keep_last=1)
    # v1/v2 expired, but their segments are also referenced by kept v3
    assert report["expired_versions"] == [1, 2]
    assert report["deleted_segments"] == []
    assert sorted(ix.search("alpha")) == ["1", "2", "3"]


def test_expire_refuses_pinned_reader_and_bad_args(spark, tmp_path):
    ix = _three_commits(spark, str(tmp_path / "pin"))
    ix.reload(version=1)
    with pytest.raises(ValueError, match="pinned"):
        ix.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError):
        ix.expire_snapshots(keep_last=0)
    ix.reload()
    assert ix.expire_snapshots(keep_last=3)["expired_versions"] == []


def test_expire_skips_unreferenced_orphan_dirs(spark, tmp_path):
    path = str(tmp_path / "orph")
    ix = _three_commits(spark, path)
    orphan = os.path.join(path, "segments", "seg-inflight-shard")
    os.makedirs(orphan)
    ix.merge_segments()
    ix.reload()
    report = ix.expire_snapshots(keep_last=1)
    # the in-flight/crashed dir is untouched and reported, not deleted
    assert os.path.isdir(orphan)
    assert "seg-inflight-shard" in report["orphans_skipped"]


def test_expire_serializes_through_writer_lock(spark, tmp_path):
    path = str(tmp_path / "lock")
    ix = _three_commits(spark, path)
    with open(os.path.join(path, "writer.lock"), "w"):
        pass  # another process holds the writer lock
    with pytest.raises(IndexWriterBusyError):
        ix.expire_snapshots(keep_last=1)
    os.unlink(os.path.join(path, "writer.lock"))


def test_expire_drops_dead_tombstone_tables(spark, tmp_path):
    """An upsert-style commit writes a parquet tombstone side-table; after
    a merge + expiry the table is unreferenced and must be deleted."""
    path = str(tmp_path / "ts")
    s = IndexSchema()
    s.text("t")
    ix = Index(spark, path, s)
    ix.add({"id": "1", "t": "alpha one"})
    ix.reload()
    seg = ix.spark.createDataFrame([("2", "alpha two")], "id string, t string")
    dels = seg.select("id")
    ix._commit_segment(seg, deletes=dels)
    ix.reload()
    tsroot = os.path.join(path, "tombstones")
    assert os.path.isdir(tsroot) and len(os.listdir(tsroot)) == 1
    ix.merge_segments()
    ix.reload()
    report = ix.expire_snapshots(keep_last=1)
    assert len(report["deleted_tombstone_tables"]) == 1
    assert os.listdir(tsroot) == []
    assert sorted(ix.search("alpha")) == ["1", "2"]


def test_expire_crash_order_never_leaves_dangling_manifest(spark, tmp_path, monkeypatch):
    """A crash mid-expiry must leave unreferenced files (safe, reported as
    orphans on the next expiry), NEVER a live manifest pointing at deleted
    segments — so expired manifests are unlinked BEFORE any file delete."""
    import shutil as _shutil

    path = str(tmp_path / "crash")
    ix = _three_commits(spark, path)
    ix.merge_segments()  # v4; v1-v3 segments become dead on expiry
    ix.reload()
    segroot = os.path.join(path, "segments")
    n_before = len(os.listdir(segroot))

    def boom(*a, **k):
        raise OSError("simulated crash during file deletion")

    monkeypatch.setattr(_shutil, "rmtree", boom)
    with pytest.raises(OSError, match="simulated crash"):
        ix.expire_snapshots(keep_last=1)
    monkeypatch.undo()

    # manifests were unlinked first: the expired versions are already gone
    assert [v["version"] for v in ix.versions()] == [4]
    with pytest.raises(ValueError, match="expired"):
        ix.reload(version=2)
    # no file was deleted (the crash preceded every rmtree) — the dead
    # segments are now unreferenced orphans, skipped and reported by the
    # next expiry rather than resurrected or left dangling
    assert len(os.listdir(segroot)) == n_before
    report = ix.expire_snapshots(keep_last=1)
    assert report["deleted_segments"] == []
    assert len(report["orphans_skipped"]) == 3
    assert sorted(ix.search("alpha")) == ["1", "2", "3"]

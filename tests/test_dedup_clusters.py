"""Near-duplicate clustering: connected components over candidate pairs.

The cluster id is the component's minimum doc id, so `doc_id == cluster`
is a deterministic keep-one-per-cluster filter — the 100 TB dedup pattern
(candidate pairs from LSH/Jaccard, components via min-label propagation).
"""

from pyspark.sql import functions as F

from tantiny_spark.pipeline import dedup


def test_connected_components_basic(spark):
    # two components {1,2,3,7} (chain) and {5,6}; 9 isolated-by-edge-absence
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (5, 6)], "a long, b long"
    )
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}


def test_connected_components_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds (diameter 11)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components(edges).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_duplicate_clusters_labels_every_doc(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
            (2, "completely different text about spark engines"),
            (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        ],
        "doc_id long, text string",
    )
    out = dedup.duplicate_clusters(df, shingle_n=2, threshold=0.5)
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert got[0] == 0 and got[1] == 0 and got[3] == 0  # one cluster, min id
    assert got[2] == 2  # singleton keeps its own id
    # keep-one-per-cluster filter is deterministic
    kept = sorted(d for d, c in got.items() if d == c)
    assert kept == [0, 2]


def test_duplicate_clusters_no_pairs(spark):
    df = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = dedup.duplicate_clusters(df, shingle_n=2, threshold=0.9)
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert got == {10: 10, 11: 11}

"""Block postings codec + block-max WAND top-k vs the naive executor."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tantiny_spark import plan as P
from tantiny_spark.analysis.tokenizers import Tokenizer
from tantiny_spark.executor import compile_plan, top_k, try_wand_topk
from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema
from tantiny_spark.wand import decode_varints, encode_varints


def test_varint_roundtrip():
    rng = np.random.default_rng(42)
    for _ in range(20):
        vals = rng.integers(0, 2**40, size=rng.integers(0, 300)).tolist()
        assert decode_varints(encode_varints(vals)).tolist() == vals
    assert decode_varints(b"").tolist() == []
    assert decode_varints(encode_varints([0])).tolist() == [0]
    assert decode_varints(encode_varints([127, 128, 16383, 16384])).tolist() == [
        127, 128, 16383, 16384,
    ]


@pytest.fixture(scope="module")
def corpus_index(spark, tmp_path_factory):
    # Zipfian-ish corpus big enough for multiple blocks/buckets
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    probs = np.array([1.0 / (i + 1) for i in range(50)])
    probs /= probs.sum()
    rows = []
    for i in range(1500):
        n = int(rng.integers(5, 60))
        words = rng.choice(vocab, size=n, p=probs)
        rows.append((f"doc{i:05d}", " ".join(words)))
    df = spark.createDataFrame(rows, "id string, text string")

    schema = IndexSchema()
    schema.text("text")
    idx = Index(spark, str(tmp_path_factory.mktemp("wand") / "idx"), schema)
    idx.add_dataframe(df)
    return idx.reload()


def _naive_topk(idx, plan, k):
    return [
        (r["id"], r["score"])
        for r in top_k(compile_plan(plan, idx.ctx), idx.ctx, k).collect()
    ]


def _wand_topk(idx, plan, k):
    fast = try_wand_topk(plan, idx.ctx, k, min_total_df=0)
    assert fast is not None, "WAND path should apply"
    return [(r["id"], r["score"]) for r in top_k(fast, idx.ctx, k).collect()]


@pytest.mark.parametrize(
    "terms", [["w0"], ["w3"], ["w0", "w7"], ["w1", "w20", "w45"]]
)
def test_wand_matches_naive(corpus_index, terms):
    idx = corpus_index
    plan = P.disjunction(*[P.Term("text", t) for t in terms])
    naive = _naive_topk(idx, plan, 10)
    wand = _wand_topk(idx, plan, 10)
    assert [i for i, _ in wand] == [i for i, _ in naive]
    for (_, sw), (_, sn) in zip(wand, naive):
        assert sw == pytest.approx(sn, rel=1e-9)


def test_wand_boost(corpus_index):
    idx = corpus_index
    plan = P.Term("text", "w5").boost(2.5)
    naive = _naive_topk(idx, plan, 5)
    wand = _wand_topk(idx, plan, 5)
    assert wand == [(i, pytest.approx(s, rel=1e-9)) for i, s in naive]


def test_wand_missing_term(corpus_index):
    idx = corpus_index
    plan = P.Term("text", "nosuchterm")
    fast = try_wand_topk(plan, idx.ctx, 10, min_total_df=0)
    assert fast is not None and fast.count() == 0


def test_wand_not_applicable_falls_back(corpus_index):
    idx = corpus_index
    mixed = P.Term("text", "w0") & P.Term("text", "w1")
    assert try_wand_topk(mixed, idx.ctx, 10) is None
    # search() still answers via the naive path
    assert len(idx.search(mixed, limit=5)) == 5


def test_blocks_metadata_sound(corpus_index):
    """Every block's (min_dl, max_tf) really bounds its docs."""
    idx = corpus_index
    blocks = idx.ctx.blocks
    assert blocks is not None
    sample = blocks.where(F.col("term") == "w0").collect()
    assert sample, "head term should have blocks"
    from tantiny_spark import scoring
    from tantiny_spark.wand import BUCKET_SPAN

    table = np.asarray(scoring.FIELDNORM_TABLE, dtype=np.float64)
    for row in sample:
        gaps = decode_varints(row["docs"])
        docs = np.cumsum(gaps) + row["bucket"] * BUCKET_SPAN
        tfs = decode_varints(row["tfs"])
        norms = np.frombuffer(row["norms"], dtype=np.uint8)
        assert len(docs) == row["n"] == len(tfs) == len(norms)
        assert docs[0] == row["first_doc"] and docs[-1] == row["last_doc"]
        assert (np.diff(docs) > 0).all()
        assert tfs.max() == row["max_tf"]
        assert table[norms].min() == row["min_dl"]


@pytest.fixture(scope="module")
def multiseg_index(spark, tmp_path_factory):
    """Multi-segment snapshot with NON-lexicographic id/doc_id alignment:
    two add_dataframe commits append disjoint doc_id ranges, and the ids are
    crafted so string order disagrees with insertion order across segments.
    Ties at the k boundary are common (tf=1 + quantized norms), so the WAND
    truncation must rank ties inclusively and leave the final id-asc
    tie-break to top_k (ADVICE round 1)."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    probs = np.array([1.0 / (i + 1) for i in range(30)])
    probs /= probs.sum()

    def mkrows(prefix, n, start):
        rows = []
        for i in range(n):
            ln = int(rng.integers(5, 40))
            words = rng.choice(vocab, size=ln, p=probs)
            # zz-prefixed ids in segment 1, aa-prefixed in segment 2:
            # lexicographic order is the REVERSE of doc_id order
            rows.append((f"{prefix}{start + i:05d}", " ".join(words)))
        return rows

    schema = IndexSchema()
    schema.text("text")
    idx = Index(spark, str(tmp_path_factory.mktemp("wandms") / "idx"), schema)
    idx.add_dataframe(spark.createDataFrame(mkrows("zz", 700, 0), "id string, text string"))
    idx.add_dataframe(spark.createDataFrame(mkrows("aa", 700, 0), "id string, text string"))
    return idx.reload()


@pytest.mark.parametrize("terms", [["w0"], ["w0", "w5"], ["w2", "w11", "w25"]])
def test_wand_matches_naive_multisegment(multiseg_index, terms):
    idx = multiseg_index
    # two segments present, no tombstones → block fast path usable
    assert idx.ctx.blocks is not None
    plan = P.disjunction(*[P.Term("text", t) for t in terms])
    for k in (5, 10, 25):
        naive = _naive_topk(idx, plan, k)
        fast = try_wand_topk(plan, idx.ctx, k, min_total_df=0)
        assert fast is not None
        wand = [(r["id"], r["score"]) for r in top_k(fast, idx.ctx, k).collect()]
        assert [i for i, _ in wand] == [i for i, _ in naive]
        for (_, sw), (_, sn) in zip(wand, naive):
            assert sw == pytest.approx(sn, rel=1e-9)


def test_local_rank_prune_bounds_final_window_input(spark):
    """When τ prunes nothing (near-uniform distinct scores), the global
    rank window must NOT sort the whole matched doc-set in one task: the
    shuffle-free per-partition pre-prune keeps only local rank-≤k rows, so
    the final single-partition stage sees ≤ partitions·(k+ties) rows."""
    from tantiny_spark.wand import _local_rank_prune

    n, parts, k = 8000, 8, 10
    df = (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("doc_id"),
            # distinct, near-uniform scores — nothing for τ to prune
            (F.lit(1.0) + F.col("id") * 1e-9).alias("score"),
        )
    )
    pruned = _local_rank_prune(df, k)
    cnt = pruned.count()
    assert cnt <= parts * k  # bounded by partitions·k, nowhere near n
    assert cnt >= k  # every global survivor is still present
    top = set(
        r["doc_id"]
        for r in pruned.orderBy(F.col("score").desc()).limit(k).collect()
    )
    assert top == set(range(n - k, n))  # exact global top-k survives


def test_local_rank_prune_keeps_boundary_ties(spark):
    """Rows tied with a partition's k-th-largest score must survive the
    local prune — a cross-partition tie at the global k-boundary would
    otherwise be dropped and break the rank (ties-inclusive) semantics."""
    from tantiny_spark.wand import _local_rank_prune

    # one partition: scores [5, 4, 3, 3, 3, 1], k=3 → kth-largest = 3;
    # ALL the 3s must survive, the 1 must not
    df = spark.createDataFrame(
        [(0, 5.0), (1, 4.0), (2, 3.0), (3, 3.0), (4, 3.0), (5, 1.0)],
        "doc_id long, score double",
    ).coalesce(1)
    got = sorted(
        r["doc_id"] for r in _local_rank_prune(df, 3).collect()
    )
    assert got == [0, 1, 2, 3, 4]


def test_wand_final_stage_not_fed_by_full_docset(corpus_index):
    """Physical-plan shape: the final global window is fed by the
    per-partition prune (a MapInPandas/ArrowEval stage), not directly by
    the bucket decoder — i.e. the single-partition sort input is pruned."""
    idx = corpus_index
    plan = P.term_query(idx.schema, "text", "w0") | P.term_query(
        idx.schema, "text", "w1"
    )
    out = try_wand_topk(plan, idx.ctx, 10, min_total_df=0)
    assert out is not None
    phys = out._jdf.queryExecution().executedPlan().toString()
    # the Window node's subtree must contain the prune stage
    win = phys.find("Window")
    assert win != -1
    assert "MapInPandas" in phys[win:] or "FlatMapGroupsInPandas" in phys[win:]


def test_wand_matches_naive_with_tombstones(spark, tmp_path_factory):
    """Deletes between merges must not disable the block fast path: deleted
    docs are baked inside the compressed blocks, so the decoder anti-joins
    the dead doc_id set — including BEFORE τ is taken, so a deleted top
    scorer can't push τ above the true k-th live score."""
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    probs = np.array([1.0 / (i + 1) for i in range(30)])
    probs /= probs.sum()

    def mkrows(prefix, n):
        return [
            (
                f"{prefix}{i:05d}",
                " ".join(rng.choice(vocab, size=int(rng.integers(5, 40)), p=probs)),
            )
            for i in range(n)
        ]

    schema = IndexSchema()
    schema.text("text")
    idx = Index(spark, str(tmp_path_factory.mktemp("wandtomb") / "idx"), schema)
    idx.add_dataframe(spark.createDataFrame(mkrows("zz", 400), "id string, text string"))
    idx.add_dataframe(spark.createDataFrame(mkrows("aa", 400), "id string, text string"))
    idx = idx.reload()

    plan = P.disjunction(P.Term("text", "w0"), P.Term("text", "w3"))
    # delete the current top-5 (their baked block scores would distort τ if
    # the dead filter ran after thresholding) plus some mid-pack docs
    before = _naive_topk(idx, plan, 5)
    with idx.transaction():
        for doc_id, _ in before:
            idx.delete(doc_id)
        idx.delete("zz00100")
        idx.delete("aa00200")
    idx = idx.reload()

    assert idx.ctx.blocks is not None  # fast path stays on with tombstones
    assert idx.ctx.dead_docs is not None
    for k in (5, 10, 25):
        naive = _naive_topk(idx, plan, k)
        fast = try_wand_topk(plan, idx.ctx, k, min_total_df=0)
        assert fast is not None
        wand = [(r["id"], r["score"]) for r in top_k(fast, idx.ctx, k).collect()]
        assert [i for i, _ in wand] == [i for i, _ in naive]
        for (_, sw), (_, sn) in zip(wand, naive):
            assert sw == pytest.approx(sn, rel=1e-9)
    deleted = {d for d, _ in before}
    got = {i for i, _ in _wand_topk(idx, plan, 25)}
    assert not (got & deleted)


def test_varint_vectorized_encode_byte_identical():
    """encode_varints dispatches small inputs to the classic loop and large
    arrays to the vectorized numpy pass — both must produce the identical
    LEB128 byte stream (the on-disk block format must not depend on the
    input size that happened to be encoded)."""
    rng = np.random.default_rng(7)

    def ref_encode(vals):
        out = bytearray()
        for v in vals:
            v = int(v)
            while True:
                byte = v & 0x7F
                v >>= 7
                if v:
                    out.append(byte | 0x80)
                else:
                    out.append(byte)
                    break
        return bytes(out)

    cases = [
        [],
        [0],
        [127, 128, 129, 16383, 16384],
        list(range(1000)),  # crosses the vectorized threshold
        rng.integers(0, 2**62, size=5000).tolist(),
        [2**62 - 1] * 300,
    ]
    for vals in cases:
        enc = encode_varints(vals)
        assert enc == ref_encode(vals)
        assert decode_varints(enc).tolist() == [int(v) for v in vals]


def test_build_blocks_batch_boundaries_and_run_carry(spark):
    """The batched block encoder must produce the same blocks regardless of
    how Arrow batches slice a partition: a run crossing a batch boundary is
    carried over, never split mid-run."""
    import pandas as pd

    from tantiny_spark.wand import BLOCK_SIZE, BUCKET_SPAN, build_blocks

    n = 1000
    pdf = pd.DataFrame(
        {
            "field": ["text"] * n,
            "term": ["hot"] * (n // 2) + ["rare"] * (n // 2),
            "doc_id": list(range(n // 2)) + list(range(0, n, 2))[: n // 2],
            "tf": [1 + (i % 5) for i in range(n)],
            "positions": [[0]] * n,
            "norm_id": [1 + (i % 7) for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf).coalesce(1).sortWithinPartitions(
        "field", "term", "doc_id"
    )
    small = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    rows_default = [r.asDict() for r in build_blocks(df).collect()]
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        rows_sliced = [r.asDict() for r in build_blocks(df).collect()]
    finally:
        if small is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", small)
    key = lambda r: (r["field"], r["term"], r["bucket"], r["block_no"])  # noqa: E731
    assert sorted(rows_default, key=key) == sorted(rows_sliced, key=key)
    # shape sanity: each block covers <= BLOCK_SIZE docs of one bucket
    for r in rows_default:
        assert r["n"] <= BLOCK_SIZE
        assert r["first_doc"] // BUCKET_SPAN == r["bucket"]
        assert r["last_doc"] // BUCKET_SPAN == r["bucket"]

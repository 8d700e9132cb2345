"""Compressed block postings + block-max top-k pruning.

The performance layer over the flat postings table (SURVEY.md §7 step 11,
north_star: "delta-gap + varint-compressed posting lists with skip/block-max
metadata built via vectorized Arrow UDFs ... block-max WAND top-k pruning").

Layout — the ``blocks`` segment table, one row per ≤128-doc block:

  field, term, bucket (doc_id // BUCKET_SPAN), block_no,
  n (docs), first_doc, last_doc,
  docs (binary: varint delta-gaps), tfs (binary: varint),
  norms (binary: 1 byte fieldnorm id each),
  min_dl (double), max_tf (int)

Buckets are fixed doc_id spans, so every term's bucket b covers the same doc
range — block metadata of different terms aligns by bucket, which is what
lets a disjunction prune whole buckets. Grouping for the encode kernel is
(field, term, bucket): bounded at BUCKET_SPAN docs regardless of how hot the
term is — Zipfian head terms are skew-proof by construction.

Query-side: distributed block-max pruning, the set-based adaptation of WAND
(single-node WAND is a sequential doc-at-a-time cursor algorithm; on Spark
the sound equivalent is two passes):

  1. per-bucket upper bound ub(b) = Σ_t idf_t·(k1+1)·maxtf_t(b) /
     (maxtf_t(b) + k1·(1−b+b·min_dl_t(b)/avgdl)) from metadata only
     (a column-pruned scan — no posting bytes read);
  2. decode the C highest-ub "champion" buckets exactly → threshold τ =
     k-th best real score (a valid lower bound of the final k-th score);
  3. decode only buckets with ub ≥ τ; exact-score them; global top-k.

Upper bounds are computed from min_dl/max_tf at query time (not a baked
score), so they stay sound when avgdl drifts as segments merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from tantiny_spark import scoring

BLOCK_SIZE = 128
BUCKET_SPAN = 8192

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("docs", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("norms", T.BinaryType(), False),
        T.StructField("min_dl", T.DoubleType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
    ]
)


# --- varint codec (vectorized decode; encode is build-time only) -----------

def _encode_varints_vec(v: np.ndarray) -> tuple:
    """Vectorized LEB128 encode of an int64 array. Returns
    (bytes, value_end_offsets) so callers can slice the encoded stream per
    value range without re-encoding — the whole-batch path build_blocks uses
    to encode every block of a partition in one call."""
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes needed per value: 1 + how many 7-bit thresholds it crosses
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 9):
        nb += v >= (1 << (7 * k))
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    for j in range(max_nb):
        mask = nb > j
        chunk = ((v[mask] >> (7 * j)) & 0x7F).astype(np.uint8)
        cont = (nb[mask] - 1) > j  # continuation bit on all but last byte
        out[starts[mask] + j] = chunk | (cont.astype(np.uint8) << 7)
    return out.tobytes(), ends


def encode_varints(vals) -> bytes:
    """LEB128 encode. Byte-identical to the classic per-value loop (pinned
    by tests/test_wand.py round-trips); small inputs keep the loop (numpy
    per-call setup overhead exceeds it below a couple hundred values),
    large arrays take the vectorized pass."""
    v = np.asarray(vals, dtype=np.int64)
    if v.size == 0:
        return b""
    if v.size < 256:
        out = bytearray()
        for x in v:
            x = int(x)
            while True:
                byte = x & 0x7F
                x >>= 7
                if x:
                    out.append(byte | 0x80)
                else:
                    out.append(byte)
                    break
        return bytes(out)
    return _encode_varints_vec(v)[0]


def decode_varints(buf: bytes) -> np.ndarray:
    """Vectorized LEB128 decode: one pass of numpy ops, no Python loop."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = (b & 0x80) == 0
    num_id = np.cumsum(ends) - ends  # which number each byte belongs to
    idx = np.flatnonzero(ends)
    starts = np.concatenate(([0], idx[:-1] + 1))
    shifts = (np.arange(b.size, dtype=np.int64) - starts[num_id]) * 7
    vals = np.zeros(idx.size, dtype=np.int64)
    np.add.at(vals, num_id, (b & 0x7F).astype(np.int64) << shifts)
    return vals


# --- build: flat postings → block table -------------------------------------

def _encode_arrays(fields, terms, docs, tfs, norms, norm_table) -> pd.DataFrame:
    """Encode a slice of the sorted postings stream (complete runs only)
    into block rows — fully vectorized: run/block boundaries, delta gaps,
    and both varint streams are computed over the WHOLE slice in numpy; the
    only per-block Python work is slicing the three byte streams. Produces
    exactly the rows the old per-run encoder did, in the same order."""
    n = docs.size
    buckets = docs // BUCKET_SPAN
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = (
        (fields[1:] != fields[:-1])
        | (terms[1:] != terms[:-1])
        | (buckets[1:] != buckets[:-1])
    )
    if n > 1 and ((~new_run[1:]) & (docs[1:] <= docs[:-1])).any():
        # defensive: a coalesced-file partition could concatenate two sorted
        # runs of the same key out of order; negative gaps must never reach
        # the varint encoder. Stable sort by doc within each run (lexsort's
        # primary key is the LAST one).
        run_id = np.cumsum(new_run) - 1
        order = np.lexsort((docs, run_id))
        fields, terms = fields[order], terms[order]
        docs, tfs, norms = docs[order], tfs[order], norms[order]
        buckets = buckets[order]
    run_starts = np.flatnonzero(new_run)
    run_id = np.cumsum(new_run) - 1
    pos_in_run = np.arange(n, dtype=np.int64) - run_starts[run_id]
    new_block = new_run | (pos_in_run % BLOCK_SIZE == 0)
    block_starts = np.flatnonzero(new_block)
    nblk = block_starts.size
    block_ends = np.empty(nblk, dtype=np.int64)
    block_ends[:-1] = block_starts[1:]
    block_ends[-1] = n
    # delta gaps: within a block vs previous doc; block-leading value is the
    # delta from the bucket base
    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = docs[1:] - docs[:-1]
    gaps[block_starts] = docs[block_starts] - buckets[block_starts] * BUCKET_SPAN
    doc_bytes, doc_ends = _encode_varints_vec(gaps)
    tf_bytes, tf_ends = _encode_varints_vec(tfs)
    d_off = np.concatenate(([0], doc_ends))
    t_off = np.concatenate(([0], tf_ends))
    norm_u8 = norms.astype(np.uint8).tobytes()
    dl = norm_table[norms]
    return pd.DataFrame(
        {
            "field": fields[block_starts],
            "term": terms[block_starts],
            "bucket": buckets[block_starts],
            "block_no": (pos_in_run[block_starts] // BLOCK_SIZE).astype(np.int32),
            "n": (block_ends - block_starts).astype(np.int32),
            "first_doc": docs[block_starts],
            "last_doc": docs[block_ends - 1],
            "docs": [
                doc_bytes[d_off[s]:d_off[e]]
                for s, e in zip(block_starts, block_ends)
            ],
            "tfs": [
                tf_bytes[t_off[s]:t_off[e]]
                for s, e in zip(block_starts, block_ends)
            ],
            "norms": [norm_u8[s:e] for s, e in zip(block_starts, block_ends)],
            "min_dl": np.minimum.reduceat(dl, block_starts),
            "max_tf": np.maximum.reduceat(tfs, block_starts).astype(np.int32),
        }
    )


def build_blocks(postings: DataFrame) -> DataFrame:
    """Streaming Arrow kernel over the (field, term, doc_id)-sorted postings
    layout: each task scans its sorted partition once, slicing encode runs at
    (field, term, bucket) boundaries with numpy — no per-group shuffle and no
    per-group pandas materialization (the sort the storage layout needs
    anyway IS the grouping). A run that crosses a partition boundary simply
    yields two block sets for the same bucket, which the decoder and the
    per-bucket max-aggregation both handle.

    Each Arrow batch is encoded in ONE vectorized pass (_encode_arrays);
    only the trailing run is carried over, since the next batch may
    continue it (runs are bounded at BUCKET_SPAN docs, so the carry stays
    small no matter how hot the term)."""
    norm_table = np.asarray(scoring.FIELDNORM_TABLE, dtype=np.float64)

    def encode_stream(batches):
        pend = None  # carry-over arrays: (fields, terms, docs, tfs, norms)
        for pdf in batches:
            if pdf.empty:
                continue
            fields = pdf["field"].to_numpy()
            terms = pdf["term"].to_numpy()
            docs = pdf["doc_id"].to_numpy(dtype=np.int64)
            tfs = pdf["tf"].to_numpy(dtype=np.int64)
            norms = pdf["norm_id"].fillna(1).to_numpy(dtype=np.int64)
            if pend is not None:
                fields = np.concatenate((pend[0], fields))
                terms = np.concatenate((pend[1], terms))
                docs = np.concatenate((pend[2], docs))
                tfs = np.concatenate((pend[3], tfs))
                norms = np.concatenate((pend[4], norms))
            # hold back the trailing run — the next batch may continue it
            buckets = docs // BUCKET_SPAN
            changed = np.flatnonzero(
                (fields[1:] != fields[:-1])
                | (terms[1:] != terms[:-1])
                | (buckets[1:] != buckets[:-1])
            )
            if changed.size == 0:
                pend = (fields, terms, docs, tfs, norms)
                continue
            cut = int(changed[-1]) + 1  # start of the trailing run
            pend = (
                fields[cut:].copy(), terms[cut:].copy(), docs[cut:].copy(),
                tfs[cut:].copy(), norms[cut:].copy(),
            )
            yield _encode_arrays(
                fields[:cut], terms[:cut], docs[:cut], tfs[:cut], norms[:cut],
                norm_table,
            )
        if pend is not None:
            yield _encode_arrays(*pend, norm_table)

    sorted_postings = postings.select(
        "field", "term", "doc_id", "tf", "norm_id"
    )
    return sorted_postings.mapInPandas(encode_stream, BLOCKS_SCHEMA)


def decode_block_scores(
    pdf: pd.DataFrame, weights: dict, avgdl: float, tf1: bool
) -> pd.DataFrame:
    """Decode one bucket's blocks for the query terms and accumulate per-doc
    BM25. weights: term -> idf. Pure numpy."""
    norm_table = np.asarray(scoring.FIELDNORM_TABLE, dtype=np.float64)
    acc: dict = {}
    doc_parts, score_parts = [], []
    for _, row in pdf.iterrows():
        gaps = decode_varints(row["docs"])
        docs = np.cumsum(gaps) + int(row["bucket"]) * BUCKET_SPAN
        tfs = (
            np.ones(len(docs)) if tf1 else decode_varints(row["tfs"]).astype(np.float64)
        )
        norms = np.frombuffer(row["norms"], dtype=np.uint8).astype(np.int64)
        dl = norm_table[norms]
        idf = weights[row["term"]]
        denom = tfs + scoring.K1 * (1.0 - scoring.B + scoring.B * dl / avgdl)
        score = idf * (scoring.K1 + 1.0) * tfs / denom
        doc_parts.append(docs)
        score_parts.append(score)
    if not doc_parts:
        return pd.DataFrame({"doc_id": [], "score": []})
    all_docs = np.concatenate(doc_parts)
    all_scores = np.concatenate(score_parts)
    # deterministic summation order: sort contributions within each doc so
    # equal-input docs produce bit-identical sums no matter how the shuffle
    # ordered the block rows (float addition is not associative)
    order = np.lexsort((all_scores, all_docs))
    all_docs, all_scores = all_docs[order], all_scores[order]
    s = pd.Series(all_scores).groupby(pd.Series(all_docs), sort=True).sum()
    return pd.DataFrame({"doc_id": s.index.astype(np.int64), "score": s.to_numpy()})


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def wand_topk(
    blocks: DataFrame,
    terms: list,
    weights: dict,
    avgdl: float,
    k: int = 10,
    tf1: bool = True,
    champions: int = 4,
    dead_docs: DataFrame | None = None,
) -> DataFrame:
    """Top-k scored docs for a weighted disjunction of terms over the block
    table. Returns DataFrame[doc_id, score] of exactly ≤k rows.

    terms: [(field, term)]; weights: {term: idf}; avgdl: current global value.
    dead_docs: doc_ids tombstoned since the last merge (small — broadcast
    anti-joined right after each decode, BEFORE τ is taken, so a deleted
    high scorer can neither occupy a top-k slot nor push τ above the true
    k-th live score, which would make the pruning unsound).
    """
    field = terms[0][0]
    term_names = [t for _, t in terms]
    tblocks = blocks.where(
        (F.col("field") == field) & (F.col("term").isin(term_names))
    )

    # pass 0: metadata-only upper bound per bucket (no binary columns read)
    w_expr = F.create_map(
        *[x for t in term_names for x in (F.lit(t), F.lit(float(weights[t])))]
    )
    maxtf = F.when(F.lit(tf1), F.lit(1.0)).otherwise(F.col("max_tf").cast("double"))
    ub_term = (
        w_expr[F.col("term")]
        * (scoring.K1 + 1.0)
        * maxtf
        / (
            maxtf
            + scoring.K1
            * (1.0 - scoring.B + scoring.B * F.col("min_dl") / F.lit(avgdl))
        )
    )
    # per (term,bucket) take the max over its blocks, then sum across terms
    bucket_ub = (
        tblocks.select("term", "bucket", ub_term.alias("ub"))
        .groupBy("term", "bucket")
        .agg(F.max("ub").alias("ub"))
        .groupBy("bucket")
        .agg(F.sum("ub").alias("ub"))
    )

    def decode_bucket_ids(bucket_ids: list) -> DataFrame:
        # literal isin → (field, term, bucket) Parquet pushdown on the block
        # table; no join needed for the (tiny) champion set
        sel = tblocks.where(F.col("bucket").isin(bucket_ids))

        def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return decode_block_scores(pdf, weights, avgdl, tf1)

        return sel.groupBy("bucket").applyInPandas(
            lambda key, pdf: _kernel(pdf), RESULT_SCHEMA
        )

    def decode_buckets(bucket_df: DataFrame) -> DataFrame:
        # NO forced broadcast: the survivor set is usually tiny (τ pruned
        # hard) and AQE will broadcast it then — but when τ prunes little
        # (near-uniform scores, or the τ=-inf fallback on <k champion
        # docs) survivors ≈ every bucket of the query terms, which at
        # 10^12 docs is millions of rows; forcing a broadcast there is a
        # driver OOM. Let AQE pick broadcast-vs-shuffle from the agg's
        # runtime stats.
        sel = tblocks.join(bucket_df.select("bucket"), "bucket", "left_semi")

        def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return decode_block_scores(pdf, weights, avgdl, tf1)

        return sel.groupBy("bucket").applyInPandas(
            lambda key, pdf: _kernel(pdf), RESULT_SCHEMA
        )

    def live(scored: DataFrame) -> DataFrame:
        if dead_docs is None:
            return scored
        return scored.join(
            F.broadcast(dead_docs.select("doc_id")), "doc_id", "left_anti"
        )

    # job 1 (metadata only, no posting bytes): champion bucket ids
    champ_ids = [
        r["bucket"]
        for r in bucket_ub.orderBy(F.col("ub").desc(), F.col("bucket").asc())
        .limit(max(champions, 1))
        .collect()
    ]

    # job 2: decode champions exactly → threshold τ (valid lower bound of the
    # final kth score)
    champ_scores = live(decode_bucket_ids(champ_ids))
    top_rows = (
        champ_scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    )
    tau = top_rows[k - 1]["score"] if len(top_rows) >= k else float("-inf")

    # final job: decode only buckets whose upper bound beats τ. The bound is
    # evaluated JVM-side while exact scores come from the numpy decoder, so
    # the same arithmetic can differ in the last ulp across engines — a
    # relative epsilon keeps the pruning sound (a doc scoring exactly τ must
    # never lose its bucket to cross-engine rounding). Decoding a handful of
    # extra borderline buckets costs nothing in correctness: survivors are
    # exact-scored anyway.
    tau_safe = tau - abs(tau) * 1e-9 - 1e-12
    survivors = bucket_ub.where(
        (F.col("ub") >= F.lit(tau_safe)) & (~F.col("bucket").isin(champ_ids))
        if champ_ids
        else F.col("ub") >= F.lit(tau_safe)
    )
    rest_scores = live(decode_buckets(survivors))
    allscores = champ_scores.unionByName(rest_scores)
    # keep ALL docs tied with the k-th score (rank, not row_number): the final
    # tie-break is id-STRING asc, applied by top_k — doc_id order only equals
    # id order within a single segment, so truncating here by doc_id would
    # return different ids than the naive path on multi-segment snapshots.
    #
    # The global rank window is single-partition by construction, so it is
    # fed through a shuffle-free per-partition pre-prune first: each task
    # keeps only its local rank-≤k rows (score ≥ local k-th-largest — a
    # superset of every global survivor, ties inclusive), so when τ prunes
    # little (disjunctions of common near-uniform-scoring terms) the one
    # final task ranks ≤ partitions·(k+ties) rows, not the whole matched
    # doc-set.
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc())
    return (
        _local_rank_prune(allscores, k)
        .withColumn("__r", F.rank().over(w))
        .where(F.col("__r") <= k)
        .select("doc_id", "score")
    )


def _local_rank_prune(scores: DataFrame, k: int) -> DataFrame:
    """Per-partition rank-≤k pre-filter (ties inclusive), no shuffle.

    A row whose own partition already holds ≥k strictly-greater scores has
    global rank >k, so dropping it cannot change the global rank-≤k set;
    rows tied with the local k-th-largest are kept, so cross-partition ties
    at the global boundary always survive to the final window. Batches
    stream through with a running top table, so memory per task stays
    O(k + ties), not O(partition)."""

    def prune(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat((best, pdf))
            if len(cur) > k:
                s = cur["score"].to_numpy()
                kth = np.partition(s, len(s) - k)[len(s) - k]  # k-th largest
                cur = cur[cur["score"] >= kth]
            best = cur
        if best is not None and len(best):
            yield best[["doc_id", "score"]]

    return scores.mapInPandas(prune, RESULT_SCHEMA)

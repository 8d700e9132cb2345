"""Training-set preparation primitives: deterministic hash splits and
fixed-size document chunking.

Both are the last mile of a 100 TB corpus pipeline — after cleaning and
dedup, the corpus is (a) split into train/validation/test ONCE and forever
(membership must be a pure function of the key, never of sampling state,
so re-runs, backfills and incremental appends land rows in the same
split), and (b) cut into bounded-size chunks for sequence packing.

Everything is pure JVM codegen (md5 / conv / split / slice / array_join
/ posexplode): no Python in the row path, no shuffle in either operator —
both are narrow per-row transforms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Denominator of the md5-derived unit fraction: first 8 hex chars.
_HASH_SPACE = float(1 << 32)


def hash_fraction(key: Column | str, salt: str = "split") -> Column:
    """Deterministic uniform fraction in [0, 1) from a row key.

    ``md5(salt ':' key)`` first 8 hex chars → 32-bit integer / 2^32. The
    salt decorrelates independent decisions made from the same key (e.g.
    a split assignment and a downsampling gate must not reuse one hash).
    Portable: any engine with md5 reproduces membership bit-for-bit.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(F.concat(F.lit(salt + ":"), k.cast("string"))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(_HASH_SPACE)


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a ``split`` label from key-hash thresholds.

    ``splits`` maps label → fraction (must sum to ~1; the LAST label in
    insertion order absorbs rounding). Default 98/1/1 train/val/test.
    Membership is a pure function of (salt, key): appending new rows later
    never reassigns old ones, and any engine can recompute the same split.
    """
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not splits or any(v < 0 for v in splits.values()):
        raise ValueError("splits must be non-empty with non-negative fractions")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    frac = hash_fraction(key, salt)
    labels = list(splits)
    expr = F.lit(labels[-1])
    cum = 0.0
    conds = []
    for name in labels[:-1]:
        cum += splits[name]
        conds.append((name, cum))
    for name, threshold in reversed(conds):
        expr = F.when(frac < threshold, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def hash_split_sql(
    key: str,
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> str:
    """DuckDB expression computing the identical ``split`` label."""
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    frac = (
        f"(('0x' || substr(md5('{salt}:' || {key}::VARCHAR), 1, 8))::BIGINT"
        f" / {_HASH_SPACE!r})"
    )
    labels = list(splits)
    sql = f"'{labels[-1]}'"
    cum = 0.0
    conds = []
    for name in labels[:-1]:
        cum += splits[name]
        conds.append((name, cum))
    for name, threshold in reversed(conds):
        sql = f"CASE WHEN {frac} < {threshold!r} THEN '{name}' ELSE {sql} END"
    return sql


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    max_words: int = 200,
    stride: int | None = None,
) -> DataFrame:
    """Cut documents into word-bounded chunks for sequence packing.

    Returns (id_col, chunk_id, n_words, chunk_text): chunk ``i`` covers
    words ``[i*stride, i*stride + max_words)`` (whitespace-split, original
    spelling preserved, single-space rejoined). ``stride`` defaults to
    ``max_words`` (disjoint chunks); a smaller stride yields overlapping
    windows for retrieval-style chunking. Empty documents produce no rows.

    Narrow plan: split → transform/sequence → posexplode, all codegen'd —
    a 100 TB corpus chunks at scan speed with zero shuffle.
    """
    if max_words < 1:
        raise ValueError("max_words must be >= 1")
    stride = max_words if stride is None else stride
    if stride < 1:
        raise ValueError("stride must be >= 1")
    col = F.coalesce(F.col(text), F.lit(""))
    words = F.filter(F.split(col, r"\s+"), lambda w: w != "")

    def chunkify(w):
        # w is the BOUND word array: referencing ``words`` inside the
        # per-chunk lambda would re-split the whole document per chunk
        # (Catalyst inlines reused Columns; see dedup.shingles_col)
        # number of chunk starts: ceil((len - max_words) / stride) + 1, min 1
        n_start = F.when(
            F.size(w) <= max_words, F.lit(1)
        ).otherwise(
            F.ceil((F.size(w) - max_words) / F.lit(float(stride))).cast("int")
            + 1
        )
        return F.when(
            F.size(w) > 0,
            F.transform(
                F.sequence(F.lit(0), n_start - 1),
                lambda i: F.slice(w, i * stride + 1, max_words),
            ),
        ).otherwise(F.array().cast("array<array<string>>"))

    chunks = F.element_at(F.transform(F.array(words), chunkify), 1)
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__w")
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.size("__w").cast("long").alias("n_words"),
        F.array_join("__w", " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
    max_words: int = 200,
    stride: int | None = None,
) -> str:
    """DuckDB query mirroring :func:`chunk_documents` bit-for-bit."""
    stride = max_words if stride is None else stride
    return f"""
WITH tok AS (
  SELECT {id_col},
         list_filter(string_split_regex(coalesce({text}, ''), '\\s+'),
                     x -> x <> '') AS w
  FROM {table}
),
n AS (
  SELECT {id_col}, w,
         CASE WHEN len(w) <= {max_words} THEN 1
              ELSE CAST(ceil((len(w) - {max_words}) / {float(stride)!r}) AS INT) + 1
         END AS n_start
  FROM tok WHERE len(w) > 0
),
ex AS (
  SELECT {id_col},
         unnest(generate_series(0, n_start - 1)) AS chunk_id, w
  FROM n
)
SELECT {id_col}, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(w[chunk_id * {stride} + 1 : chunk_id * {stride} + {max_words}]) AS BIGINT)
         AS n_words,
       array_to_string(w[chunk_id * {stride} + 1 : chunk_id * {stride} + {max_words}], ' ')
         AS chunk_text
FROM ex
"""


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum: str = "lang",
    key: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixing step that
    turns a cleaned corpus into a training mix ("keep 100% of books, 30% of
    web, 5% of low-quality web").

    Keeps a row iff ``hash_fraction(key, salt) < rates[stratum]`` (strata
    absent from ``rates`` use ``default_rate``). Membership is a pure
    function of (salt, key): re-runs and incremental appends keep exactly
    the same rows, and any md5-capable engine reproduces the mix.

    Scale shape: ``rates`` is configuration, not data — it folds into a
    literal CASE chain, so the whole operator is ONE narrow codegen'd
    filter: no join, no shuffle, no driver state."""
    for name, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0,1] (got {r})")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1] (got {default_rate})")
    rate = F.lit(default_rate)
    for name in sorted(rates):
        rate = F.when(F.col(stratum) == name, F.lit(rates[name])).otherwise(rate)
    return df.where(hash_fraction(key, salt) < rate)


def stratified_sample_sql(
    rates: dict[str, float],
    stratum: str = "lang",
    key: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> str:
    """DuckDB WHERE-clause predicate mirroring :func:`stratified_sample`."""
    frac = (
        f"(('0x' || substr(md5('{salt}:' || {key}::VARCHAR), 1, 8))::BIGINT"
        f" / {_HASH_SPACE!r})"
    )
    rate = f"{default_rate!r}"
    for name in sorted(rates):
        rate = f"CASE WHEN {stratum} = '{name}' THEN {rates[name]!r} ELSE {rate} END"
    return f"{frac} < ({rate})"


def pack_sequences(
    df: DataFrame,
    key: str = "doc_id",
    tokens: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-cut sequence packing — assign every document its slot in
    a fixed-token-budget training sequence (the sample-packing step between
    a cleaned corpus and an LLM dataloader).

    Documents are dealt into ``n_buckets`` uniform hash buckets, shuffled
    into a deterministic pseudo-random order inside each bucket
    (``hash_fraction(key, salt)``, key tie-break), then concatenated;
    sequence boundaries fall every ``budget`` tokens, so a document starts
    in sequence ``floor(prev_cum / budget)`` at offset
    ``prev_cum % budget`` (documents may straddle a boundary — standard
    concat-then-cut packing). Returns
    ``(key, bucket, seq_id, seq_off, <tokens>)``.

    Everything is a pure function of (salt, key, token counts): re-runs
    and engine ports reproduce identical packing.

    Scale shape: ONE hash-partition shuffle on ``bucket`` feeding a
    per-bucket running sum — parallelism = ``n_buckets`` (set it ≥ cluster
    cores; buckets are md5-uniform so no skew), each bucket streams in
    sorted order with O(1) window state. Never a global sort, never a
    single-partition window.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from pyspark.sql import Window

    bucket = F.floor(
        hash_fraction(key, salt + ":bucket") * F.lit(n_buckets)
    ).cast("int")
    order = hash_fraction(key, salt + ":order")
    w = (
        Window.partitionBy("bucket")
        .orderBy("__ord", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.sum(F.col(tokens)).over(w) - F.col(tokens)
    return (
        df.select(
            F.col(key), F.col(tokens), bucket.alias("bucket"),
            order.alias("__ord"),
        )
        .withColumn("seq_id", F.floor(prev / F.lit(budget)).cast("long"))
        .withColumn("seq_off", (prev % F.lit(budget)).cast("long"))
        .drop("__ord")
        .select(key, "bucket", "seq_id", "seq_off", tokens)
    )


def pack_sequences_sql(
    table: str,
    key: str = "doc_id",
    tokens: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 64,
    salt: str = "pack",
) -> str:
    """DuckDB mirror of :func:`pack_sequences` (identical md5 bucket/order
    derivation, window running sum, floor-div boundaries)."""
    def frac(s: str) -> str:
        return (
            f"(('0x' || substr(md5('{s}:' || {key}::VARCHAR), 1, 8))::BIGINT"
            f" / {_HASH_SPACE!r})"
        )

    return f"""
WITH base AS (
  SELECT {key}, {tokens},
         CAST(floor({frac(salt + ':bucket')} * {n_buckets}) AS INT) AS bucket,
         {frac(salt + ':order')} AS ord
  FROM {table}
),
cum AS (
  SELECT {key}, {tokens}, bucket,
         (sum({tokens}) OVER (PARTITION BY bucket ORDER BY ord, {key}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - {tokens})::BIGINT AS prev
  FROM base
)
SELECT {key}, bucket, (prev // {budget})::BIGINT AS seq_id,
       (prev % {budget})::BIGINT AS seq_off, {tokens}
FROM cum
"""

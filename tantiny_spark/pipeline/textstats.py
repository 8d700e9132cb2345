"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in functions only — NO Python anywhere, including the
language-ID heuristic), so every operator runs inside whole-stage codegen
and scales linearly with executors: token counting, quality scoring,
document fingerprinting, stopword-profile language ID.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# whitespace+punctuation word splitter shared by all stats
TOKEN_SPLIT = r"[^0-9A-Za-z]+"

# tiny multilingual stopword profiles for the language-ID heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it", "a"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ich", "ein", "zu", "den"},
    "fr": {"le", "la", "les", "de", "et", "est", "pas", "une", "que", "je"},
    "es": {"el", "la", "los", "de", "y", "es", "no", "una", "que", "en"},
    "ru": {"и", "в", "не", "на", "что", "это", "с", "он", "как", "я"},
}

_DEFAULT_STOPWORDS = sorted(_LANG_PROFILES["en"])


def tokens_col(text: str | Column = "text") -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def with_token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """n_tokens, n_distinct_tokens, type-token ratio, mean token length."""
    toks = tokens_col(text)
    return (
        df.withColumn("__toks", toks)
        .withColumn("n_tokens", F.size("__toks"))
        .withColumn("n_distinct", F.size(F.array_distinct("__toks")))
        .withColumn(
            "ttr",
            F.when(F.col("n_tokens") > 0, F.col("n_distinct") / F.col("n_tokens"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_token_len",
            F.when(
                F.col("n_tokens") > 0,
                F.aggregate("__toks", F.lit(0), lambda a, t: a + F.length(t))
                / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__toks")
    )


def with_quality_score(
    df: DataFrame, text: str = "text", stopwords: list | None = None
) -> DataFrame:
    """Heuristic quality score in [0,1] from length, stopword ratio and
    type-token ratio — the usual cheap pre-filter before expensive model
    scoring in a data pipeline. Pure column arithmetic."""
    stopwords = sorted(stopwords or _DEFAULT_STOPWORDS)
    toks = tokens_col(text)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n = F.size(toks)
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    stop_ratio = F.when(n > 0, n_stop / F.least(n.cast("double"), F.lit(float(len(stopwords))))).otherwise(F.lit(0.0))
    ttr = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    len_score = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    return df.withColumn(
        "quality_score",
        F.round(0.4 * len_score + 0.3 * stop_ratio + 0.3 * ttr, 6),
    )


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic content fingerprint: md5 of the whitespace-normalized
    lowercased text. Exact-dup key and lineage id for resume checks."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(normalized))


# GPT-2-style pre-tokenizer pattern, restricted to the Rust/Java/RE2-common
# subset (the original's trailing-space lookahead dropped): contractions,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def with_bpe_token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Estimate LLM-tokenizer token counts with a BPE-style pre-tokenizer
    regex (the public GPT-2 split pattern, minus its lookahead so the same
    pattern runs on Java regex, RE2 and Rust). This is the budget-planning
    counter of a training pipeline: ~pre-tokenizer granularity, no vocab
    needed, pure JVM regexp_extract_all inside codegen."""
    pieces = F.regexp_extract_all(F.col(text), F.lit(BPE_SPLIT_PATTERN), F.lit(0))
    non_ws = F.filter(pieces, lambda p: F.trim(p) != "")
    return df.withColumn("n_bpe_tokens", F.size(non_ws))


def with_winnow_fingerprints(
    df: DataFrame, text: str = "text", k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    scheme): hash every k-char-gram of the normalized text, slide a window
    of w hashes, keep each window's minimum — a position-robust fingerprint
    set that survives local edits (the rolling-hash fingerprinting of a
    near-dup pipeline). md5 stands in for the rolling hash so the DuckDB
    oracle reproduces it bit-for-bit; everything is JVM array expressions."""
    # bind the grams array ONCE via a single-element transform lambda —
    # referencing the grams expression directly in each window slice would
    # re-evaluate the whole md5 k-gram array per window index (O(L²) md5s)
    windows = F.expr(
        f"transform(array({_grams_sql(text, k)}), g -> "
        f"CASE WHEN size(g) >= {w} THEN "
        f"transform(sequence(1, size(g) - {w - 1}), i -> array_min(slice(g, i, {w}))) "
        f"ELSE array() END)[0]"
    )
    return df.withColumn("fingerprints", F.array_distinct(windows))


def _norm_sql(text: str) -> str:
    return f"trim(regexp_replace(lower({text}), '\\\\s+', ' '))"


def _grams_sql(text: str, k: int) -> str:
    # sequence(1, 0) is DESCENDING [1,0] in Spark, never empty — guard short
    # texts explicitly.
    # The normalized string is bound ONCE as the lambda variable s: inlining
    # _norm_sql under the per-gram md5 would re-run the trim/regexp/lower
    # chain over the whole document for every character position (O(L²)
    # regex work — the same Catalyst tree-inlining trap the outer window
    # binder documents).
    return (
        f"transform(array({_norm_sql(text)}), s -> "
        f"CASE WHEN length(s) >= {k} THEN "
        f"transform(sequence(1, length(s) - {k - 1}), "
        f"i -> md5(substring(s, i, {k}))) "
        f"ELSE array() END)[0]"
    )


def with_language_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-profile language ID — fully JVM-side column arithmetic (no
    Python in the path at all): the profiles are tiny literal arrays, so
    per-language hit counts are array_intersect sizes over the first 200
    distinct tokens and the argmax is a folded CASE chain inside whole-stage
    codegen. Semantics identical to the scalar reference: iterate languages
    in sorted order, strictly-greater hit count wins, 'und' when nothing
    matches."""
    col = F.col(text)
    words = F.array_distinct(
        F.slice(
            F.filter(F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"),
                     lambda t: t != ""),
            1, 200,
        )
    )
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(_LANG_PROFILES):
        profile = F.array(*[F.lit(w) for w in sorted(_LANG_PROFILES[lang])])
        hits = F.size(F.array_intersect(words, profile))
        new_best = F.when(hits > best_hits, F.lit(lang)).otherwise(best)
        new_hits = F.when(hits > best_hits, hits).otherwise(best_hits)
        best, best_hits = new_best, new_hits
    return df.withColumn("lang_id", best)


def unigram_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Corpus-wide unigram counts: DataFrame[token, cnt].

    One explode + sum groupBy — partial aggregation folds the Zipf head
    map-side, so the shuffle carries one row per (partition, distinct
    token), not one per occurrence. The vocabulary (~millions of types
    even at web scale) is orders of magnitude smaller than the corpus."""
    ex = df.select(F.explode(tokens_col(text)).alias("token"))
    return ex.groupBy("token").agg(F.count("*").alias("cnt"))


def with_unigram_bits(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    model: DataFrame | None = None,
) -> DataFrame:
    """Per-document unigram-LM score — mean bits per token under a corpus
    unigram model (CCNet's perplexity-bucket quality signal, with the
    KenLM 5-gram model replaced by the self-trained unigram model that a
    pure-SQL oracle can replay exactly).

    Returns (id_col, n_tokens, bits_per_token) where bits_per_token =
    sum(tf * -log2(cnt/total)) / sum(tf) over the doc's tokens; low bits =
    stereotypical text, high bits = rare-token soup. Documents with zero
    tokens produce no row (nothing to score). With a frozen ``model``,
    out-of-vocabulary tokens are NOT dropped: they cost the add-one
    smoothed -log2(1/total) each (so n_tokens counts every token and an
    all-OOV doc still gets a row, at the model's maximum surprisal —
    ADVICE r03).

    Scale shape: per-doc tf pre-aggregation first (one row per (doc, token)
    — bounds Zipf-head join fan-out), then a token-keyed LEFT join against
    the vocab (broadcast when small, sort-merge otherwise — no forced
    hint), then one partial-aggregatable groupBy. The 1-row total is the
    only broadcast, which is size-safe by construction. ``model`` lets a
    frozen vocab from a reference corpus score a new corpus (the CCNet
    setup)."""
    ex = df.select(id_col, F.explode(tokens_col(text)).alias("token"))
    tf = ex.groupBy(id_col, "token").agg(F.count("*").cast("double").alias("tf"))
    vocab = model if model is not None else unigram_counts(df, text)
    vocab = vocab.select("token", F.col("cnt").cast("double").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    # LEFT join: OOV tokens under a frozen model keep their tf and cost the
    # smoothed minimum count 1 (self-trained vocab never misses, so the
    # coalesce is a no-op there)
    scored = (
        tf.join(vocab, "token", "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(1.0)))
        .crossJoin(F.broadcast(total))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.col("tf") * -F.log2(F.col("cnt") / F.col("total")))
            / F.sum("tf"),
            6,
        ).alias("bits_per_token"),
    )


def with_perplexity_bucket(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    model: DataFrame | None = None,
    cuts=(1.0 / 3.0, 2.0 / 3.0),
    labels=("head", "middle", "tail"),
    approx: bool = False,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): score
    every doc with :func:`with_unigram_bits`, cut the corpus-level
    bits_per_token distribution at ``cuts`` quantiles, and label each doc
    with its bucket — ``head`` (lowest bits: most stereotypical text),
    ``middle``, ``tail``. Returns (id_col, n_tokens, bits_per_token,
    ppl_bucket). Compose with ``prep.stratified_sample`` on ``ppl_bucket``
    for the published head-heavy sampling mix.

    Scale shape: the bits frame is ONE explode + two groupBys (see
    with_unigram_bits); the thresholds are a single global percentile agg
    whose 1-row result broadcasts into a codegen'd CASE — no sort of the
    corpus, no window. ``approx=True`` swaps the exact percentile for the
    fixed-memory t-digest sketch, the right call at 100 TB (bucket
    boundaries tolerate sketch error; the published pipeline's terciles
    are themselves estimates)."""
    cuts = [float(c) for c in cuts]
    if not cuts or any(not 0.0 < c < 1.0 for c in cuts) or (
        sorted(cuts) != cuts
    ):
        raise ValueError("cuts must be ascending quantiles in (0, 1)")
    if len(labels) != len(cuts) + 1:
        raise ValueError("need exactly len(cuts) + 1 labels")
    bits = with_unigram_bits(df, text, id_col, model)
    fracs = ", ".join(repr(c) for c in cuts)
    fn = "percentile_approx" if approx else "percentile"
    extra = ", 10000" if approx else ""
    thr = bits.agg(
        F.expr(f"{fn}(bits_per_token, array({fracs}){extra})").alias("__thr")
    )
    out = bits.crossJoin(F.broadcast(thr))
    bucket = None
    for i, lab in enumerate(labels[:-1]):
        cond = F.col("bits_per_token") <= F.element_at("__thr", i + 1)
        bucket = (
            F.when(cond, F.lit(lab)) if bucket is None
            else bucket.when(cond, F.lit(lab))
        )
    bucket = bucket.otherwise(F.lit(labels[-1]))
    return out.select(
        id_col, "n_tokens", "bits_per_token", bucket.alias("ppl_bucket")
    )

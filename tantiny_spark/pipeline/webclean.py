"""Web-corpus cleaning operators for large-scale training-data pipelines.

Three stages every Common-Crawl-scale text pipeline runs between raw
extraction (pipeline/webtext.py) and dedup/indexing, all pure JVM column
expressions (zero Python, whole-stage codegen, linear in executors):

- **boilerplate line removal** (CCNet-style paragraph dedup, Wenzek et al.
  2020): drop every line whose normalized form appears in >= ``min_df``
  distinct documents — nav bars, cookie banners, footers repeat across a
  site's pages, body text does not. Distributed shape: posexplode (narrow)
  -> line-hash groupBy for doc-frequency (shuffle 1, partial-aggregated)
  -> left_anti join of lines against boilerplate keys (shuffle 2, AQE may
  broadcast when the boilerplate set is small) -> per-doc reassembly
  groupBy (shuffle 3). No per-doc or per-line table is ever collected or
  force-broadcast; skew is bounded because the df-count groupBy key is the
  line hash (Zipfian head lines produce large *counts*, not large groups,
  thanks to partial aggregation).

- **Gopher quality flags** (the published heuristics of Rae et al. 2021,
  "Scaling Language Models: ... Gopher", appendix A1.1): word count /
  mean word length / symbol-to-word ratio / bullet- and ellipsis-line
  fractions / alphabetic-word fraction / stopword count, each as a flag
  column plus the conjunction ``gopher_pass``. Pure column arithmetic.

- **Gopher repetition filters** (same appendix, the "repetition" half):
  duplicate-line fraction and char fraction, top-n-gram char fraction
  (n=2..4), duplicate-n-gram char fraction (n=5..10 — default computes the
  endpoints). Distributed as explode → (doc, gram) groupBy chains so a
  boilerplate-heavy web corpus creates large *counts* under partial
  aggregation, never large shuffle groups.

- **URL canonicalization + dedup**: scheme/host lowercasing, default-port
  and fragment stripping, tracking-parameter removal (utm_*, gclid,
  fbclid, ref), query-parameter sort, trailing-slash trim — then exact
  dedup on the canonical form keeping the lexicographically-smallest raw
  url (deterministic representative). Re-crawls and tracking-tagged
  shares of the same page collapse to one row before expensive content
  dedup runs.

- **PII detection + scrubbing**: email / IPv4 / +-prefixed phone counts
  and placeholder redaction, patterns pinned to the Java∩RE2 subset.

- **C4 cleaning filters** (Raffel et al. 2020 §2.2): terminal-punctuation
  + >=5-word + no-javascript line filter, lorem-ipsum / curly-brace /
  min-sentences page flags.

- **corpus-wide paragraph dedup**: drop every later copy of a paragraph
  seen anywhere in the corpus (first occurrence in (id, pos) order wins)
  via one partial-aggregated min-struct groupBy — skew-safe.

- **per-host rollup**: page counts, distinct canonical URLs, text volume
  per registered host — the crawl-curation view.

Every operator is dialect-pinned the same way as pipeline/webtext.py: the
expressions use only the Java-regex ∩ RE2 ∩ DuckDB common subset, so the
DuckDB oracle (`*_sql` helpers used by __spark_entry__.py) reproduces the
output bit-for-bit (contract rows ``boilerplate``, ``gopher_quality``,
``url_dedup``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# boilerplate line removal (CCNet-style)
# ---------------------------------------------------------------------------


def line_key(line: Column) -> Column:
    """Normalized line identity: md5 of the trimmed, lowercased line."""
    return F.md5(F.trim(F.lower(line)))


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    out: str = "clean_text",
    min_df: int = 2,
) -> DataFrame:
    """Drop every non-blank line whose normalized form occurs in >= min_df
    distinct documents (ALL copies drop, CCNet semantics), preserving the
    order of surviving lines. Documents whose lines are all boilerplate
    survive with ``out = ''`` (the caller filters empties if desired).

    Returns ``df``'s columns plus ``out``.
    """
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text), "\n")).alias("pos", "line")
    ).withColumn("lk", line_key(F.col("line")))

    boiler = (
        lines.where(F.trim("line") != "")
        .groupBy("lk")
        .agg(F.count_distinct(id_col).alias("line_df"))
        .where(F.col("line_df") >= min_df)
        .select("lk")
    )

    kept = lines.join(boiler, "lk", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(out)
    )
    return df.join(rebuilt, id_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(""))
    )


def boilerplate_sql(min_df: int = 2, table: str = "documents") -> str:
    """DuckDB oracle for remove_boilerplate_lines over (doc_id, text)."""
    return f"""
WITH lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM {table}
),
keyed AS (
  SELECT doc_id, pos, line, md5(trim(lower(line))) AS lk FROM lines
),
boiler AS (
  SELECT lk FROM keyed WHERE trim(line) <> ''
  GROUP BY lk HAVING count(DISTINCT doc_id) >= {min_df}
),
kept AS (
  SELECT * FROM keyed WHERE lk NOT IN (SELECT lk FROM boiler)
)
SELECT d.doc_id,
       coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS clean_text
FROM {table} d LEFT JOIN kept k ON d.doc_id = k.doc_id
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Gopher quality flags (Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------

# the paper's "must contain at least 2 of" stopword list
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# flag thresholds, as published
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_LEN, MAX_MEAN_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_ELLIPSIS_LINE_FRAC = 0.3
MAX_BULLET_LINE_FRAC = 0.9
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORD_HITS = 2


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring, as codegen'd length arithmetic."""
    delta = F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    return (delta / len(needle)).cast("long")


def with_gopher_flags(df: DataFrame, text: str = "text") -> DataFrame:
    """Append the Gopher quality metrics and flags:

    n_words, mean_word_len, symbol_ratio, ellipsis_line_frac,
    bullet_line_frac, alpha_word_frac, stopword_hits, and booleans
    g_word_count / g_mean_len / g_symbol / g_ellipsis / g_bullet / g_alpha /
    g_stop plus their conjunction gopher_pass.

    Words split on whitespace runs; lines split on newline. All pure JVM.
    """
    col = F.coalesce(F.col(text), F.lit(""))
    words = F.filter(F.split(col, r"[ \t\r\n]+"), lambda w: w != "")
    lines = F.filter(
        F.transform(F.split(col, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    d = df.withColumn("__w", words).withColumn("__l", lines)

    n_words = F.size("__w")
    n_lines = F.size("__l")
    mean_len = F.when(
        n_words > 0,
        F.aggregate("__w", F.lit(0), lambda a, w: a + F.length(w))
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    # Gopher's symbol set: '#' and ellipsis ('…' or '...')
    n_symbols = (
        _count_occurrences(col, "#")
        + _count_occurrences(col, "…")
        + _count_occurrences(F.replace(col, F.lit("…"), F.lit("")), "...")
    )
    symbol_ratio = F.when(
        n_words > 0, n_symbols / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                F.col("__l"),
                lambda l: l.endswith("...") | l.endswith("…"),
            )
        )
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                F.col("__l"),
                lambda l: l.startswith("- ")
                | l.startswith("* ")
                | l.startswith("•"),
            )
        )
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(F.col("__w"), lambda w: w.rlike("[A-Za-z]")))
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    lowered = F.filter(
        F.split(F.lower(col), r"[^0-9a-z]+"), lambda w: w != ""
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.array_intersect(F.array_distinct(lowered), stop_arr))

    d = (
        d.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_len, 6))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 6))
        .withColumn("ellipsis_line_frac", F.round(ellipsis_frac, 6))
        .withColumn("bullet_line_frac", F.round(bullet_frac, 6))
        .withColumn("alpha_word_frac", F.round(alpha_frac, 6))
        .withColumn("stopword_hits", stop_hits)
    )
    d = (
        d.withColumn(
            "g_word_count",
            (F.col("n_words") >= MIN_WORDS) & (F.col("n_words") <= MAX_WORDS),
        )
        .withColumn(
            "g_mean_len",
            (F.col("mean_word_len") >= MIN_MEAN_LEN)
            & (F.col("mean_word_len") <= MAX_MEAN_LEN),
        )
        .withColumn("g_symbol", F.col("symbol_ratio") <= MAX_SYMBOL_RATIO)
        .withColumn(
            "g_ellipsis", F.col("ellipsis_line_frac") <= MAX_ELLIPSIS_LINE_FRAC
        )
        .withColumn("g_bullet", F.col("bullet_line_frac") <= MAX_BULLET_LINE_FRAC)
        .withColumn("g_alpha", F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC)
        .withColumn("g_stop", F.col("stopword_hits") >= MIN_STOPWORD_HITS)
    )
    return d.withColumn(
        "gopher_pass",
        F.col("g_word_count")
        & F.col("g_mean_len")
        & F.col("g_symbol")
        & F.col("g_ellipsis")
        & F.col("g_bullet")
        & F.col("g_alpha")
        & F.col("g_stop"),
    ).drop("__w", "__l")


def gopher_sql(table: str = "documents", text: str = "text") -> str:
    """DuckDB oracle for with_gopher_flags metrics (doc_id keyed)."""
    col = f"coalesce({text}, '')"
    words = f"list_filter(regexp_split_to_array({col}, '[ \\t\\r\\n]+'), w -> w <> '')"
    lines = (
        f"list_filter(list_transform(string_split({col}, chr(10)), l -> trim(l)),"
        " l -> l <> '')"
    )
    nsym = (
        f"((length({col}) - length(replace({col}, '#', '')))"
        f" + (length({col}) - length(replace({col}, '…', '')))"
        f" + (length(replace({col}, '…', ''))"
        f"    - length(replace(replace({col}, '…', ''), '...', ''))) / 3)"
    )
    lowered = f"list_filter(regexp_split_to_array(lower({col}), '[^0-9a-z]+'), w -> w <> '')"
    stop_list = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"
    return f"""
WITH base AS (
  SELECT doc_id, {words} AS w, {lines} AS l, {nsym}::BIGINT AS nsym,
         {lowered} AS lw
  FROM {table}
),
m AS (
  SELECT doc_id,
    len(w) AS n_words,
    CASE WHEN len(w) > 0 THEN round(list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w), 6) ELSE 0.0 END AS mean_word_len,
    CASE WHEN len(w) > 0 THEN round(nsym::DOUBLE / len(w), 6) ELSE 0.0 END AS symbol_ratio,
    CASE WHEN len(l) > 0 THEN round(len(list_filter(l, x -> x LIKE '%...' OR x LIKE '%…'))::DOUBLE / len(l), 6) ELSE 0.0 END AS ellipsis_line_frac,
    CASE WHEN len(l) > 0 THEN round(len(list_filter(l, x -> x LIKE '- %' OR x LIKE '* %' OR x LIKE '•%'))::DOUBLE / len(l), 6) ELSE 0.0 END AS bullet_line_frac,
    CASE WHEN len(w) > 0 THEN round(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(w), 6) ELSE 0.0 END AS alpha_word_frac,
    len(list_intersect(list_distinct(lw), {stop_list})) AS stopword_hits
  FROM base
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, ellipsis_line_frac,
       bullet_line_frac, alpha_word_frac, stopword_hits,
       (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
        AND mean_word_len >= {MIN_MEAN_LEN} AND mean_word_len <= {MAX_MEAN_LEN}
        AND symbol_ratio <= {MAX_SYMBOL_RATIO}
        AND ellipsis_line_frac <= {MAX_ELLIPSIS_LINE_FRAC}
        AND bullet_line_frac <= {MAX_BULLET_LINE_FRAC}
        AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
        AND stopword_hits >= {MIN_STOPWORD_HITS}) AS gopher_pass
FROM m
"""


# ---------------------------------------------------------------------------
# Gopher repetition filters (Rae et al. 2021, appendix A1.1, "repetition")
# ---------------------------------------------------------------------------

# thresholds as published: a document is repetition-flagged when any metric
# exceeds its cap
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = 0.20
MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
MAX_DUP_NGRAM_CHAR_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def with_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 10),
) -> DataFrame:
    """The Gopher repetition metrics, distributed as explode → groupBy chains
    (NOT array-vs-array quadratic scans — a 1 MB doc has ~200k tokens, and
    every aggregation below is keyed by (doc, line/gram) so Zipfian repeats
    produce large *counts* inside partial aggregation, never large groups):

    - ``dup_line_frac``: fraction of non-blank lines whose exact text occurs
      more than once in the document (all copies count).
    - ``dup_line_char_frac``: same, weighted by line length in characters.
    - ``top{n}_gram_char_frac`` for n in ``top_ns``: characters covered by
      the single most frequent word n-gram (count × gram length, spaces
      included) over total word characters (words joined by single spaces).
      Ties break to the lexicographically-smallest gram — deterministic.
    - ``dup{n}_gram_char_frac`` for n in ``dup_ns``: characters covered by
      every word n-gram occurring more than once (Σ count × gram length)
      over total word chars, capped at 1.0 (overlapping occurrences are
      deliberately each counted — the published filter's intent is "mostly
      repeated text scores high", and the cap keeps the ratio a ratio).

    plus boolean ``r_*`` flags per metric (True = within the cap) and their
    conjunction ``repetition_pass``. Thresholds are the published ones
    (MAX_* module constants). Exact formulas are mirrored bit-for-bit by
    ``repetition_sql`` for the DuckDB oracle contract row.
    """
    col = F.coalesce(F.col(text), F.lit(""))
    words = F.filter(F.split(F.lower(col), r"[ \t\r\n]+"), lambda w: w != "")
    base = df.select(id_col, F.col(text)).withColumn("__w", words)

    # --- line-level dup fractions: explode non-blank lines, count repeats
    lines = (
        df.select(id_col, F.explode(F.split(F.coalesce(F.col(text), F.lit("")), "\n")).alias("line"))
        .where(F.trim("line") != "")
    )
    line_counts = lines.groupBy(id_col, "line").agg(F.count("*").alias("c"))
    line_stats = line_counts.groupBy(id_col).agg(
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c")
        ).alias("dup_line_frac"),
        (
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("line")).otherwise(F.lit(0))
            )
            / F.sum(F.col("c") * F.length("line"))
        ).alias("dup_line_char_frac"),
    )

    # --- word n-gram character fractions over the normalized word stream.
    # ALL n values ride ONE tagged explode + two aggregations + one join:
    # the previous shape ran a separate explode → groupBy → (join→groupBy
    # for the top-gram argmax) branch per n, i.e. 5 full scans of the input
    # lineage and ~11 shuffles for the default (2,3,4)+(5,10) — at corpus
    # scale that is 5 corpus reads where one suffices. Values, tie-breaks
    # and null/fill semantics are unchanged (the `repetition` contract row
    # stays hash-green).
    all_top = sorted(set(top_ns))
    all_dup = sorted(set(dup_ns))

    def gram_structs(n: int):
        toks = F.col("__w")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
        grams = F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
        ).otherwise(F.array().cast("array<string>"))
        return F.transform(
            grams, lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
        )

    tagged = F.flatten(F.array(*[gram_structs(n) for n in sorted(set(all_top + all_dup))]))
    g = base.select(
        id_col,
        F.explode(tagged).alias("t"),
        F.length(F.array_join("__w", " ")).alias("total_chars"),
    ).select(
        id_col, F.col("t.n").alias("n"), F.col("t.g").alias("g"), "total_chars"
    )
    counts = g.groupBy(id_col, "n", "g").agg(
        F.count("*").alias("c"), F.first("total_chars").alias("tc")
    )
    agg_exprs = [F.first("tc").alias("tc")]
    for n in all_top:
        is_n = F.col("n") == n
        agg_exprs.append(F.max(F.when(is_n, F.col("c"))).alias(f"__cmax{n}"))
        # argmax with deterministic ties: min over (-count, gram) picks the
        # max-count gram, ties to the lexicographically-smallest gram text —
        # identical to the former max-count filter + min(g) two-step
        agg_exprs.append(
            F.min(
                F.when(is_n, F.struct((-F.col("c")).alias("negc"), F.col("g").alias("g")))
            ).alias(f"__top{n}")
        )
    for n in all_dup:
        agg_exprs.append(
            F.sum(
                F.when(
                    F.col("n") == n,
                    F.when(F.col("c") > 1, F.col("c") * F.length("g")).otherwise(F.lit(0)),
                )
            ).alias(f"__dupsum{n}")
        )
    per_doc = counts.groupBy(id_col).agg(*agg_exprs)
    metric_exprs = [F.col(id_col)]
    metric_names = []
    for n in all_top:
        name = f"top{n}_gram_char_frac"
        metric_names.append(name)
        metric_exprs.append(
            # a "top" gram must actually repeat (count >= 2) to count —
            # otherwise every short doc's arbitrary longest gram trips
            # the cap (the published filters apply the same gate); a doc
            # with no n-grams has a NULL cmax → otherwise-0.0, matching
            # the former left-join + fillna
            F.when(
                (F.col("tc") > 0) & (F.col(f"__cmax{n}") > 1),
                F.col(f"__cmax{n}") * F.length(F.col(f"__top{n}.g")) / F.col("tc"),
            )
            .otherwise(F.lit(0.0))
            .alias(name)
        )
    for n in all_dup:
        name = f"dup{n}_gram_char_frac"
        metric_names.append(name)
        metric_exprs.append(
            # guard the NULL case explicitly: least() SKIPS nulls, so a doc
            # with no n-grams of this size would get least(1.0, NULL) = 1.0
            # instead of the former left-join-null → fillna 0.0
            F.when(
                F.col(f"__dupsum{n}").isNotNull(),
                F.least(F.lit(1.0), F.col(f"__dupsum{n}") / F.col("tc")),
            ).alias(name)
        )
    gram_stats = per_doc.select(*metric_exprs)

    res = df.join(line_stats, id_col, "left").join(gram_stats, id_col, "left")
    fills = {
        "dup_line_frac": 0.0,
        "dup_line_char_frac": 0.0,
        **{name: 0.0 for name in metric_names},
    }
    res = res.fillna(fills)
    for c in fills:
        res = res.withColumn(c, F.round(F.col(c), 6))

    flags = [
        ("r_dup_line", F.col("dup_line_frac") <= MAX_DUP_LINE_FRAC),
        ("r_dup_line_char", F.col("dup_line_char_frac") <= MAX_DUP_LINE_CHAR_FRAC),
    ]
    for n in sorted(set(top_ns)):
        flags.append(
            (f"r_top{n}_gram", F.col(f"top{n}_gram_char_frac") <= MAX_TOP_NGRAM_CHAR_FRAC[n])
        )
    for n in sorted(set(dup_ns)):
        flags.append(
            (f"r_dup{n}_gram", F.col(f"dup{n}_gram_char_frac") <= MAX_DUP_NGRAM_CHAR_FRAC[n])
        )
    passing = None
    for name, c in flags:
        res = res.withColumn(name, c)
        passing = c if passing is None else (passing & c)
    return res.withColumn("repetition_pass", passing)


def repetition_sql(
    table: str = "documents", text: str = "text",
    top_ns: tuple = (2, 3, 4), dup_ns: tuple = (5, 10),
) -> str:
    """DuckDB oracle for with_repetition_flags (doc_id keyed), mirroring the
    formulas bit-for-bit: same normalization (lowercase, whitespace split),
    same tie-breaks (min gram), same rounding."""
    col = f"coalesce({text}, '')"
    words = f"list_filter(regexp_split_to_array(lower({col}), '[ \\t\\r\\n]+'), w -> w <> '')"

    def grams(n):
        return (
            f"CASE WHEN len(w) >= {n} THEN "
            f"list_transform(range(1, len(w) - {n} + 2), "
            f"i -> array_to_string(w[i:i+{n}-1], ' ')) "
            f"ELSE [] END"
        )

    tops, dups, joins = [], [], []
    for n in sorted(set(top_ns)):
        joins.append(f"""
t{n} AS (
  SELECT doc_id, g, count(*) AS c FROM
    (SELECT doc_id, unnest({grams(n)}) AS g FROM base) GROUP BY doc_id, g
),
top{n} AS (
  SELECT doc_id, min(g) FILTER (WHERE c = cmax) AS gtop, any_value(cmax) AS cmax
  FROM (SELECT doc_id, g, c, max(c) OVER (PARTITION BY doc_id) AS cmax FROM t{n})
  GROUP BY doc_id
)""")
        tops.append(
            f"round(coalesce(CASE WHEN b.tc > 0 AND top{n}.cmax > 1 THEN"
            f" top{n}.cmax * length(top{n}.gtop) / b.tc END, 0.0), 6)"
            f" AS top{n}_gram_char_frac"
        )
    for n in sorted(set(dup_ns)):
        joins.append(f"""
d{n} AS (
  SELECT doc_id, least(1.0, sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)::DOUBLE
         / any_value(tc)) AS f
  FROM (SELECT doc_id, g, count(*) AS c, any_value(tc) AS tc FROM
        (SELECT doc_id, unnest({grams(n)}) AS g, length(array_to_string(w, ' ')) AS tc
         FROM base) GROUP BY doc_id, g)
  WHERE tc > 0 GROUP BY doc_id
)""")
        dups.append(
            f"round(coalesce(d{n}.f, 0.0), 6) AS dup{n}_gram_char_frac"
        )
    top_joins = "".join(f" LEFT JOIN top{n} USING (doc_id)" for n in sorted(set(top_ns)))
    dup_joins = "".join(f" LEFT JOIN d{n} USING (doc_id)" for n in sorted(set(dup_ns)))
    flag_terms = [
        f"dup_line_frac <= {MAX_DUP_LINE_FRAC}",
        f"dup_line_char_frac <= {MAX_DUP_LINE_CHAR_FRAC}",
    ] + [
        f"top{n}_gram_char_frac <= {MAX_TOP_NGRAM_CHAR_FRAC[n]}" for n in sorted(set(top_ns))
    ] + [
        f"dup{n}_gram_char_frac <= {MAX_DUP_NGRAM_CHAR_FRAC[n]}" for n in sorted(set(dup_ns))
    ]
    return f"""
WITH base AS (
  SELECT doc_id, {words} AS w,
         length(array_to_string({words}, ' ')) AS tc
  FROM {table}
),
lines AS (
  SELECT doc_id, line FROM
    (SELECT doc_id, unnest(string_split({col}, chr(10))) AS line FROM {table})
  WHERE trim(line) <> ''
),
lc AS (
  SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line
),
ls AS (
  SELECT doc_id,
         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c), 6) AS dup_line_frac,
         round(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)::DOUBLE
               / sum(c * length(line)), 6) AS dup_line_char_frac
  FROM lc GROUP BY doc_id
),{",".join(joins)},
mtr AS (
  SELECT b.doc_id,
         coalesce(ls.dup_line_frac, 0.0) AS dup_line_frac,
         coalesce(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
         {", ".join(tops)},
         {", ".join(dups)}
  FROM base b LEFT JOIN ls USING (doc_id){top_joins}{dup_joins}
)
SELECT *, ({" AND ".join(flag_terms)}) AS repetition_pass FROM mtr
"""

# tracking parameters dropped during canonicalization (lowercase-compared)
TRACKING_PARAM_RE = r"^(utm_[0-9a-z_]*|gclid|fbclid|ref|mc_cid|mc_eid)="


def canonical_url(url: str | Column = "url") -> Column:
    """Canonical form of an http(s) URL, as one JVM expression chain:

    1. fragment stripped;
    2. scheme + authority lowercased (path/query case preserved);
    3. default port stripped (``:80`` for http, ``:443`` for https);
    4. tracking query parameters dropped (TRACKING_PARAM_RE, matched on the
       lowercased parameter), remaining parameters sorted bytewise, ``?``
       dropped when nothing survives;
    5. one trailing ``/`` trimmed from a non-root path.
    """
    col = F.col(url) if isinstance(url, str) else url
    col = F.regexp_replace(col, "#.*", "")  # 1. fragment

    head = F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(col, F.length(head) + 1, F.length(col))
    head = F.lower(head)  # 2. scheme+authority case
    head = F.when(  # 3. default ports
        head.startswith("http://") & head.endswith(":80"),
        F.substring(head, F.lit(1), F.length(head) - 3),
    ).when(
        head.startswith("https://") & head.endswith(":443"),
        F.substring(head, F.lit(1), F.length(head) - 4),
    ).otherwise(head)

    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(
        F.length(rest) > F.length(path),
        F.substring(rest, F.length(path) + 2, F.length(rest)),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(params), "&")  # 4. sort survivors

    path = F.when(  # 5. trailing slash (non-root)
        path.endswith("/") & (F.length(path) > 1),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)

    return F.concat(
        head,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url: str = "url") -> DataFrame:
    """Exact dedup on the canonical URL: one row per canonical form with the
    duplicate count and the lexicographically-smallest raw url as the
    deterministic representative. One partial-aggregated groupBy — uniform
    md5-like key space (canonical strings), no skew concern."""
    return (
        df.withColumn("canon_url", canonical_url(url))
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(url).alias("representative_url"),
        )
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB mirror of canonical_url over a VARCHAR expression."""
    e = f"regexp_replace({expr}, '#.*', '')"
    head = f"regexp_extract({e}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)"
    rest = f"substring({e}, length({head}) + 1)"
    lhead = f"lower({head})"
    head2 = (
        f"CASE WHEN {lhead} LIKE 'http://%' AND {lhead} LIKE '%:80' "
        f"THEN substring({lhead}, 1, length({lhead}) - 3) "
        f"WHEN {lhead} LIKE 'https://%' AND {lhead} LIKE '%:443' "
        f"THEN substring({lhead}, 1, length({lhead}) - 4) "
        f"ELSE {lhead} END"
    )
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    query = (
        f"CASE WHEN length({rest}) > length({path}) "
        f"THEN substring({rest}, length({path}) + 2) ELSE '' END"
    )
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(lower(p), '{TRACKING_PARAM_RE}'))"
    )
    qsorted = f"array_to_string(list_sort({params}), '&')"
    path2 = (
        f"CASE WHEN {path} LIKE '%/' AND length({path}) > 1 "
        f"THEN substring({path}, 1, length({path}) - 1) ELSE {path} END"
    )
    return (
        f"concat({head2}, {path2}, "
        f"CASE WHEN {qsorted} <> '' THEN concat('?', {qsorted}) ELSE '' END)"
    )


# ---------------------------------------------------------------------------
# PII detection + scrubbing
# ---------------------------------------------------------------------------

# Patterns live in the Java-regex ∩ RE2 ∩ DuckDB common subset (no
# backreferences, no lookaround) so the DuckDB oracle runs the identical
# patterns. Matching is leftmost + greedy in both engines for these shapes.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b"
)
PII_PHONE_RE = r"\+[0-9][0-9 ()\-]{6,}[0-9]"


def with_pii_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-document PII occurrence counts (``n_emails`` / ``n_ipv4`` /
    ``n_phones``) plus ``scrubbed`` text with matches replaced by typed
    placeholder tokens (``<EMAIL>`` / ``<IP>`` / ``<PHONE>``), the standard
    pre-training redaction pass (emails/IPs as in the published CCNet /
    RefinedWeb pipelines; phones restricted to international ``+``-prefixed
    forms to bound false positives on prose numbers).

    Counts are measured on the ORIGINAL text per type (the three patterns
    cannot overlap: emails contain letters, IPv4 needs dots, the phone
    class has no dots); scrubbing chains email → ip → phone replacements.
    Pure JVM regexp expressions — one codegen'd Project, zero Python,
    embarrassingly parallel at any scale.
    """
    col = F.coalesce(F.col(text), F.lit(""))
    scrubbed = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(col, F.lit(PII_EMAIL_RE)))
        .withColumn("n_ipv4", F.regexp_count(col, F.lit(PII_IPV4_RE)))
        .withColumn("n_phones", F.regexp_count(col, F.lit(PII_PHONE_RE)))
        .withColumn("scrubbed", scrubbed)
    )


def pii_sql(table: str = "documents", text: str = "text") -> str:
    """DuckDB oracle for with_pii_counts (doc_id keyed), identical patterns
    and replacement chain ('g' flag = replace-all, Spark's default)."""
    col = f"coalesce({text}, '')"

    def esc(p):
        return p.replace("'", "''")

    em, ip, ph = esc(PII_EMAIL_RE), esc(PII_IPV4_RE), esc(PII_PHONE_RE)
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'{em}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), "
        f"'{ph}', '<PHONE>', 'g')"
    )
    return f"""
SELECT doc_id,
       len(regexp_extract_all({col}, '{em}')) AS n_emails,
       len(regexp_extract_all({col}, '{ip}')) AS n_ipv4,
       len(regexp_extract_all({col}, '{ph}')) AS n_phones,
       {scrub} AS scrubbed
FROM {table}
"""


# ---------------------------------------------------------------------------
# C4 cleaning filters (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------

C4_TERMINAL_RE = r'[.!?"]$'
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def with_c4_flags(df: DataFrame, text: str = "text") -> DataFrame:
    """The published C4 cleaning rules as one codegen'd Project:

    line filters (producing ``c4_text``, surviving lines joined by \\n):
      keep a line iff its right-trimmed form ends in terminal punctuation
      (``. ! ? "``), it has >= 5 whitespace-separated words, and it does
      not contain the word "javascript" (case-insensitive).

    page flags (True = keeps the page):
      ``c4_min_sentences``: >= 3 sentences survive, counted as terminal
      ``[.!?]`` occurrences in ``c4_text`` (deterministic proxy for the
      paper's sentence splitter);
      ``c4_no_lorem``: "lorem ipsum" absent (lowercased match);
      ``c4_no_brace``: no ``{`` anywhere (code page signal);
      and the conjunction ``c4_pass``.

    The paper's bad-words list is a policy input, not an algorithm — pass
    the corpus-appropriate list to an extra rlike filter downstream.
    All higher-order array expressions over the split lines: zero Python,
    zero shuffles, linear in executors at any corpus size.
    """
    col = F.coalesce(F.col(text), F.lit(""))

    def line_ok(l):  # noqa: E741
        words = F.size(F.filter(F.split(F.trim(l), " +"), lambda w: w != ""))
        return (
            F.rtrim(l).rlike(C4_TERMINAL_RE)
            & (words >= C4_MIN_LINE_WORDS)
            & ~F.lower(l).contains("javascript")
        )

    c4_text = F.array_join(F.filter(F.split(col, "\n"), line_ok), "\n")
    out = df.withColumn("c4_text", c4_text)
    n_sent = F.regexp_count(F.col("c4_text"), F.lit(r"[.!?]"))
    out = (
        out.withColumn("c4_min_sentences", n_sent >= C4_MIN_SENTENCES)
        .withColumn("c4_no_lorem", ~F.lower(col).contains("lorem ipsum"))
        .withColumn("c4_no_brace", ~col.contains("{"))
    )
    return out.withColumn(
        "c4_pass",
        F.col("c4_min_sentences") & F.col("c4_no_lorem") & F.col("c4_no_brace"),
    )


def c4_sql(table: str = "documents", text: str = "text") -> str:
    """DuckDB oracle for with_c4_flags (doc_id keyed), mirroring the line
    predicate and sentence proxy bit-for-bit."""
    col = f"coalesce({text}, '')"
    line_ok = (
        f"regexp_matches(rtrim(l), '[.!?\"]$') "
        f"AND len(list_filter(string_split_regex(trim(l), ' +'), w -> w <> '')) >= {C4_MIN_LINE_WORDS} "
        f"AND NOT contains(lower(l), 'javascript')"
    )
    return f"""
WITH c AS (
  SELECT doc_id,
         coalesce(array_to_string(
           list_filter(string_split({col}, chr(10)), l -> {line_ok}),
           chr(10)), '') AS c4_text,
         NOT contains(lower({col}), 'lorem ipsum') AS c4_no_lorem,
         NOT contains({col}, '{{') AS c4_no_brace
  FROM {table}
)
SELECT doc_id, c4_text,
       len(regexp_extract_all(c4_text, '[.!?]')) >= {C4_MIN_SENTENCES} AS c4_min_sentences,
       c4_no_lorem, c4_no_brace,
       (len(regexp_extract_all(c4_text, '[.!?]')) >= {C4_MIN_SENTENCES}
        AND c4_no_lorem AND c4_no_brace) AS c4_pass
FROM c
"""


# ---------------------------------------------------------------------------
# corpus-wide paragraph dedup (first occurrence wins)
# ---------------------------------------------------------------------------


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    out: str = "dedup_text",
    sep: str = "\n",
) -> DataFrame:
    """Global exact paragraph dedup: every later copy of a paragraph that
    appears anywhere else in the corpus is dropped; the FIRST occurrence in
    ``(id, pos)`` order survives (the C4/CCNet "three-sentence span" dedup
    semantics at paragraph granularity, deterministic without requiring a
    total document order to be materialized).

    Distributed shape: posexplode (narrow) → md5-key groupBy computing
    ``min(struct(id, pos))`` (ONE shuffle; partial-aggregatable, so a
    paragraph duplicated 10^9 times produces one min per map partition, not
    a 10^9-row group — skew-safe) → join back on (key, id, pos) → per-doc
    ordered reassembly. Blank paragraphs are preserved verbatim (they carry
    document structure and cannot be "duplicates").
    """
    paras = df.select(
        id_col, F.posexplode(F.split(F.coalesce(F.col(text), F.lit("")), sep)).alias("pos", "para")
    ).withColumn("pk", F.md5(F.col("para")))

    firsts = (
        paras.where(F.trim("para") != "")
        .groupBy("pk")
        .agg(F.min(F.struct(id_col, "pos")).alias("first"))
        .select("pk", F.col(f"first.{id_col}").alias("__fid"), F.col("first.pos").alias("__fpos"))
    )
    kept = paras.join(firsts, "pk", "left").where(
        (F.trim("para") == "")  # blanks always survive
        | ((F.col(id_col) == F.col("__fid")) & (F.col("pos") == F.col("__fpos")))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias(out)
    )
    return df.join(rebuilt, id_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(""))
    )


def dedup_paragraphs_sql(table: str = "documents", text: str = "text") -> str:
    """DuckDB oracle for dedup_paragraphs over (doc_id, text)."""
    return f"""
WITH paras AS (
  SELECT doc_id,
         unnest(string_split(coalesce({text}, ''), chr(10))) AS para,
         unnest(range(1, len(string_split(coalesce({text}, ''), chr(10))) + 1)) AS pos
  FROM {table}
),
ranked AS (
  SELECT doc_id, pos, para,
         CASE WHEN trim(para) = '' THEN 1 ELSE
           row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos)
         END AS rn
  FROM paras
)
SELECT d.doc_id,
       coalesce(string_agg(r.para, chr(10) ORDER BY r.pos), '') AS dedup_text
FROM {table} d
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON d.doc_id = r.doc_id
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# per-host rollup
# ---------------------------------------------------------------------------


def host_of(url: str | Column = "url") -> Column:
    """Lowercased registered host of an http(s) URL (port stripped)."""
    col = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)", 1))
    return F.regexp_replace(host, r":[0-9]+$", "")


def host_stats(df: DataFrame, url: str = "url", text: str = "text") -> DataFrame:
    """Per-host corpus rollup (the crawl-curation view: which sites dominate
    the corpus): page count, distinct canonical URLs, total/mean text chars.
    One partial-aggregated groupBy on the host key — Zipfian hosts produce
    large counts, not large groups."""
    return (
        df.withColumn("host", host_of(url))
        .withColumn("__canon", canonical_url(url))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.count_distinct("__canon").alias("n_urls"),
            F.sum(F.length(F.coalesce(F.col(text), F.lit("")))).alias("total_chars"),
            F.round(F.avg(F.length(F.coalesce(F.col(text), F.lit("")))), 4).alias("mean_chars"),
        )
    )


def host_stats_sql(table: str, url: str = "url", text: str = "text") -> str:
    """DuckDB oracle for host_stats."""
    host = (
        f"regexp_replace(lower(regexp_extract({url}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]+)', 1)), ':[0-9]+$', '')"
    )
    return f"""
SELECT {host} AS host,
       count(*) AS n_pages,
       count(DISTINCT {canonical_url_sql(url)}) AS n_urls,
       sum(length(coalesce({text}, '')))::BIGINT AS total_chars,
       round(avg(length(coalesce({text}, ''))), 4) AS mean_chars
FROM {table}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Domain-blocklist filtering (UT1 / adult-domain-list style)
# ---------------------------------------------------------------------------

def domain_suffixes(host: Column) -> Column:
    """All blockable domain suffixes of a host, most-specific first:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com, example.com]``.
    Bare TLD suffixes (single label) are excluded — no real blocklist
    blocks ``com``, and keeping them would make one bad list entry
    catastrophic. Single-label and empty hosts (``localhost``, a
    scheme-less or unparseable URL) therefore yield NO suffixes — without
    the guard, ``sequence(0, n-2)`` runs DESCENDING to [0, -1] at n=1 and
    ``slice(..., 0, ...)`` kills the whole job. Pure codegen'd array
    expression, no Python."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def filter_blocked_hosts(
    df: DataFrame, blocked: DataFrame, url: str = "url"
) -> DataFrame:
    """Drop rows whose URL host — or ANY parent domain of it — appears in
    ``blocked`` (one ``domain`` column), the UT1-blocklist semantics used
    by RefinedWeb/FineWeb-style web curation. Returns the input rows that
    survive, with a ``host`` column attached.

    Scale shape: the suffix explosion runs on the DISTINCT host set (host
    cardinality ≪ page count on a web corpus), the blocklist side is
    blocklist-sized (MBs — broadcast-eligible, left to AQE), and the final
    exclusion is one LEFT ANTI join of pages against blocked hosts. No
    per-page suffix explosion, no window, no driver materialization."""
    pages = df.withColumn("host", host_of(url))
    hosts = pages.select("host").distinct()
    return pages.join(_blocked_host_set(hosts, blocked), "host", "left_anti")


def _blocked_host_set(hosts: DataFrame, blocked: DataFrame) -> DataFrame:
    """Distinct hosts (one ``host`` column in, same out) whose host or any
    parent-domain suffix appears in ``blocked.domain`` — the single
    derivation both :func:`filter_blocked_hosts` and ``clean_corpus``'s
    blocked_host stage share, so their semantics cannot drift."""
    return (
        hosts.select(
            "host", F.explode(domain_suffixes(F.col("host"))).alias("__sfx")
        )
        .join(blocked.select(F.col("domain").alias("__sfx")), "__sfx", "leftsemi")
        .select("host")
        .distinct()
    )


def filter_blocked_hosts_sql(
    table: str, blocked_domains: list, url: str = "url"
) -> str:
    """DuckDB oracle for :func:`filter_blocked_hosts` with a literal
    blocklist: a host is blocked when it equals a blocked domain or ends
    with ``'.' || domain``."""
    host = (
        f"regexp_replace(lower(regexp_extract({url}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]+)', 1)), ':[0-9]+$', '')"
    )
    conds = " OR ".join(
        f"h = '{d}' OR h LIKE '%.{d}'" for d in blocked_domains
    ) or "FALSE"
    return f"""
SELECT * EXCLUDE (h), h AS host FROM (
  SELECT *, {host} AS h FROM {table}
) WHERE NOT ({conds})
"""

# ---------------------------------------------------------------------------
# End-to-end cleaning funnel (FineWeb/RefinedWeb-style pipeline composition)
# ---------------------------------------------------------------------------

# funnel precedence: a doc is attributed to the FIRST stage that drops it
FUNNEL_STAGES = (
    "url_dup", "blocked_host", "lang", "gopher", "repetition", "c4",
    "exact_dup",
)


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    url: str = "url",
    text: str = "text",
    lang: str = "lang",
    blocklist: DataFrame | None = None,
    keep_langs=None,
) -> tuple:
    """The composed web-curation funnel the individual stages exist for
    (the FineWeb / RefinedWeb / C4 pipeline shape): URL dedup → domain
    blocklist → language filter → Gopher quality → Gopher repetition →
    C4 rules → exact text dedup → PII scrub. Returns ``(clean, report)``:

    - ``clean``: the surviving rows (original columns, ``text`` replaced
      by its PII-scrubbed form);
    - ``report``: DataFrame[stage, n_docs] — the retention funnel, one
      row per FUNNEL_STAGES entry that dropped docs plus ``kept`` (the
      numbers FineWeb publishes per stage).

    Spark-first shape: instead of filter-after-filter (one pass per
    stage), every per-doc stage becomes a FLAG column computed in one
    shared plan, and the doc's ``drop_reason`` is a single CASE chain in
    funnel order — so the funnel costs the flag computations plus exactly
    THREE keyed shuffles for the corpus-wide stages (canonical-url
    first-occurrence, repetition's gram aggs, and exact-text
    first-occurrence among pre-survivors), and the report is ONE tiny
    groupBy on drop_reason. Dropping a stage's docs at stage k never
    re-reads the corpus.

    Exact dedup runs AMONG the docs that passed every earlier stage
    (matching the published pipelines: dedup after filtering) — its
    first-occurrence groupBy is keyed by md5(text), uniform by
    construction. All stage internals are the plan-asserted building
    blocks above (no windows, partial-aggregatable groupBys, one
    codegen'd Project for gopher/C4/PII).
    """
    # a NULL url must not silently vanish in the equi-join below (NULL
    # never equals NULL): each null-URL doc gets a doc-unique sentinel
    # key, so it is never a url-dup and always flows through the funnel
    d = df.withColumn(
        "__curl",
        F.coalesce(
            canonical_url(url),
            F.concat(F.lit("\x00nourl:"), F.col(id_col).cast("string")),
        ),
    )
    first_url = d.groupBy("__curl").agg(F.min(id_col).alias("__first_url_id"))
    d = d.join(first_url, "__curl")

    if blocklist is not None:
        d = d.withColumn("__host", host_of(url))
        blocked_hosts = (
            _blocked_host_set(
                d.select(F.col("__host").alias("host")).distinct(), blocklist
            )
            .select(F.col("host").alias("__host"))
            .withColumn("__blocked", F.lit(True))
        )
        d = d.join(blocked_hosts, "__host", "left")
        blocked = F.coalesce(F.col("__blocked"), F.lit(False))
    else:
        blocked = F.lit(False)

    lang_bad = (
        ~F.col(lang).isin(*[str(x) for x in keep_langs])
        if keep_langs else F.lit(False)
    )

    d = with_gopher_flags(d, text)
    d = with_repetition_flags(d, id_col, text)
    d = with_c4_flags(d, text)

    pre = (
        F.when(F.col(id_col) != F.col("__first_url_id"), F.lit("url_dup"))
        .when(blocked, F.lit("blocked_host"))
        .when(lang_bad, F.lit("lang"))
        .when(~F.col("gopher_pass"), F.lit("gopher"))
        .when(~F.col("repetition_pass"), F.lit("repetition"))
        .when(~F.col("c4_pass"), F.lit("c4"))
    )
    d = d.withColumn("__pre", pre)
    d = d.withColumn("__h", F.md5(F.coalesce(F.col(text), F.lit(""))))
    first_text = (
        d.where(F.col("__pre").isNull())
        .groupBy("__h")
        .agg(F.min(id_col).alias("__first_text_id"))
    )
    d = d.join(first_text, "__h", "left")
    d = d.withColumn(
        "drop_reason",
        F.coalesce(
            F.col("__pre"),
            F.when(
                F.col(id_col) != F.col("__first_text_id"), F.lit("exact_dup")
            ),
        ),
    )

    out_cols = list(df.columns)
    clean = with_pii_counts(d.where(F.col("drop_reason").isNull()), text)
    clean = clean.select(
        *[
            F.col("scrubbed").alias(text) if c == text else F.col(c)
            for c in out_cols
        ]
    )
    report = (
        d.groupBy(
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("stage")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("stage")
    )
    return clean, report


def clean_corpus_report_sql(
    table: str = "documents", url: str = "url", text: str = "text",
    lang: str = "lang", keep_langs=None,
) -> str:
    """DuckDB oracle for the :func:`clean_corpus` retention report
    (blocklist-free form), composed from the per-stage oracles with the
    same funnel precedence and survivor-scoped exact dedup."""
    lang_case = (
        f"WHEN d.{lang} NOT IN ("
        + ", ".join(f"'{x}'" for x in keep_langs)
        + ") THEN 'lang' " if keep_langs else ""
    )
    return f"""
WITH g AS (SELECT doc_id, gopher_pass FROM ({gopher_sql(table, text)})),
rep AS (SELECT doc_id, repetition_pass FROM ({repetition_sql(table, text)})),
c4f AS (SELECT doc_id, c4_pass FROM ({c4_sql(table, text)})),
u AS (SELECT doc_id, {canonical_url_sql(url)} AS curl FROM {table}),
fu AS (SELECT curl, min(doc_id) AS first_id FROM u GROUP BY curl),
pre AS (
  SELECT d.doc_id, coalesce(d.{text}, '') AS t,
    CASE WHEN d.doc_id <> fu.first_id THEN 'url_dup'
         {lang_case}WHEN NOT g.gopher_pass THEN 'gopher'
         WHEN NOT rep.repetition_pass THEN 'repetition'
         WHEN NOT c4f.c4_pass THEN 'c4'
         ELSE NULL END AS pre
  FROM {table} d
  JOIN u USING (doc_id) JOIN fu ON u.curl = fu.curl
  JOIN g USING (doc_id) JOIN rep USING (doc_id) JOIN c4f USING (doc_id)
),
ft AS (SELECT md5(t) AS h, min(doc_id) AS first_t FROM pre
       WHERE pre IS NULL GROUP BY 1),
fin AS (
  SELECT p.doc_id,
         coalesce(p.pre, CASE WHEN p.doc_id <> ft.first_t
                              THEN 'exact_dup' END) AS reason
  FROM pre p LEFT JOIN ft ON md5(p.t) = ft.h
)
SELECT coalesce(reason, 'kept') AS stage, count(*)::BIGINT AS n_docs
FROM fin GROUP BY 1 ORDER BY 1
"""

"""BM25 scoring contract — all score constants and formulas live here.

Mirrors Tantivy 0.16's default scorer (the engine behind the reference,
/root/reference/Cargo.toml:14): BM25 with k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5) / (df + 0.5)),
tf_part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)).

Semantics pinned by the reference (SURVEY.md §2.5):
- Term and facet queries are built with IndexRecordOption::Basic
  (/root/reference/src/query.rs:53,190) so term frequency reads as 1.
- Phrase queries score with the phrase frequency.
- Fuzzy/regex/prefix (automaton), range, and all queries are constant
  score 1.0.
- Conjunction/disjunction sum the scores of matching children; boost
  multiplies.
- Document lengths (fieldnorms) are quantized to one byte at index time and
  decoded through a fixed table before entering the formula; avgdl is exact
  (total_tokens / num_docs).

Fieldnorm quantization: values 0..40 are EXACT; larger values are rounded
down onto a geometric grid (ratio ≈ 1.0855, 256 levels reaching ~2^31).
Every document shorter than 41 tokens — which includes all of the
reference's spec fixtures — therefore scores with its exact length. Parity
note: Tantivy uses a Lucene-SmallFloat-shaped table with the same exact-
below-41 property; the geometric tail here follows the same design but is
our own pinned constant (the crate source is not available in-sandbox to
copy the exact tail values, and no spec fixture exercises it).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75

# --- fieldnorm byte table -------------------------------------------------
_NUM_EXACT = 41  # lengths 0..40 stored exactly


def _build_table() -> list[int]:
    table = list(range(_NUM_EXACT))
    # geometric tail: 215 steps from 40 up to ~2^31
    ratio = (2.0**31 / 40.0) ** (1.0 / (256 - _NUM_EXACT))
    value = 40.0
    for _ in range(_NUM_EXACT, 256):
        value *= ratio
        table.append(int(value))
    # enforce strict monotonicity (rounding could create plateaus early on)
    for i in range(1, 256):
        if table[i] <= table[i - 1]:
            table[i] = table[i - 1] + 1
    return table

FIELDNORM_TABLE: list[int] = _build_table()


def fieldnorm_to_id(length: int) -> int:
    """Largest id such that FIELDNORM_TABLE[id] <= length (round down)."""
    if length < _NUM_EXACT:
        return max(length, 0)
    lo, hi = _NUM_EXACT - 1, 255
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if FIELDNORM_TABLE[mid] <= length:
            lo = mid
        else:
            hi = mid - 1
    return lo


def id_to_fieldnorm(norm_id: int) -> int:
    return FIELDNORM_TABLE[norm_id]


# --- BM25 ------------------------------------------------------------------

def idf(doc_freq: int, doc_count: int) -> float:
    x = (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)
    return math.log(1.0 + x)


def bm25(tf: float, doc_len: float, avgdl: float, doc_freq: int, doc_count: int) -> float:
    """Reference oracle for one (term, doc) contribution. The DataFrame
    executor computes the identical expression JVM-side; tests compare."""
    if avgdl <= 0:
        avgdl = 1.0
    norm = K1 * (1.0 - B + B * doc_len / avgdl)
    return idf(doc_freq, doc_count) * (K1 + 1.0) * tf / (tf + norm)


def bm25_sql(tf_expr: str, dl_expr: str, avgdl_expr: str, df_expr: str, n_expr: str) -> str:
    """The same formula as an ANSI-SQL string fragment, shared by the Spark
    executor (F.expr) and the DuckDB oracle so both engines evaluate the
    exact same expression tree."""
    return (
        f"ln(1.0 + (({n_expr}) - ({df_expr}) + 0.5) / (({df_expr}) + 0.5)) "
        f"* ({K1} + 1.0) * ({tf_expr}) "
        f"/ (({tf_expr}) + {K1} * (1.0 - {B} + {B} * ({dl_expr}) / ({avgdl_expr})))"
    )

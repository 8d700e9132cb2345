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

Fieldnorm quantization: the Lucene SmallFloat ``byte4`` code, the exact
encoding behind Tantivy's fieldnorm table (tantivy src/fieldnorm/code.rs
ports Lucene's SmallFloat.intToByte4/byte4ToInt — both public sources).
24 free values, then a 3-bit-mantissa / 5-bit-exponent float: lengths 0..40
decode EXACTLY (so every reference spec fixture, all <41 tokens, scores with
its true length); longer docs round down to the same 256-level grid Tantivy
uses, so >40-token documents — i.e. all realistic web documents — score
byte-identically to the reference design (table[255] = 2013265944).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75

# --- fieldnorm byte table (Lucene SmallFloat byte4 / Tantivy fieldnorm) ----
_NUM_EXACT = 41  # lengths 0..40 decode exactly (free values + subnormal+shift-0 runs)
_NUM_FREE = 24  # 255 - intToByte4(i32::MAX): Lucene SmallFloat's free-value count


def _build_table() -> list[int]:
    """byte4ToInt(b) for b in 0..255: b<24 literal; else 3 mantissa bits
    (implicit leading 1 unless subnormal) shifted by the 5-bit exponent,
    offset back by the free-value count."""
    table = []
    for b in range(256):
        if b < _NUM_FREE:
            table.append(b)
            continue
        e = b - _NUM_FREE
        bits = e & 0x07
        shift = (e >> 3) - 1
        decoded = bits if shift < 0 else (bits | 0x08) << shift
        table.append(_NUM_FREE + decoded)
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

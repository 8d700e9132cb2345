"""Common-Crawl-style web-page text extraction (the input_hint stage).

The north-star input is an Iceberg table of web pages
``(url, warc_ts, html:binary, text, lang)`` and the per-row invariant vs
the reference is *byte-identical extracted text per url*.  This module is
the html→text stage: a deterministic chain of regexp/replace steps that is

- **pure JVM** — built-in ``regexp_replace``/``replace`` expressions only,
  so the whole chain runs inside whole-stage codegen with zero Python and
  scales linearly with executors (no per-row UDF anywhere);
- **dialect-pinned** — every pattern is written in the Java-regex ∩ RE2
  common subset (no backreferences, no lookaround, explicit whitespace
  classes instead of ``\\s``), so the *same* step table generates both the
  Spark Column chain and the DuckDB oracle SQL (`extract_sql`), and the two
  engines produce byte-identical output (contract query ``extract_text``).

Extraction spec (deterministic by construction):

1. UTF-8 decode of the ``binary`` html column;
2. ``<script>``/``<style>`` element bodies and ``<!-- comments -->`` drop;
3. block-level closing tags and ``<br>`` become newlines (so block
   boundaries survive as line boundaries);
4. every remaining tag is stripped;
5. the HTML core entities (``&lt; &gt; &quot; &#39; &apos; &amp;``) and
   ``&nbsp;`` decode, ``&amp;`` deliberately last;
6. horizontal-whitespace runs collapse to one space, whitespace runs that
   contain a newline collapse to one newline, and both ends are trimmed.

Round-trip invariant (tested): for whitespace-normalized text,
``extract_text(wrap_html(text)) == text`` byte-for-byte — which is exactly
the shape of the synthesized Common-Crawl corpus the bench builds from.

Out-of-spec (documented): attribute values containing a literal ``>``
truncate that tag early — the standard limitation of every regex-based
stripper; a full HTML5 tree parse is a library swap behind this same API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --- the one step table both engines compile from ---------------------------

_BLOCK_TAGS = "p|div|h[1-6]|li|tr|table|ul|ol|blockquote|pre|section|article|header|footer|title"

# (pattern, replacement) — patterns in the Java∩RE2 dialect; replacements
# contain no `$`/`\` so they mean the same bytes in both engines.
REGEX_STEPS: list[tuple[str, str]] = [
    # script/style bodies are invisible content, not text
    (r"(?is)<script\b[^>]*>.*?</script[ \t\r\n]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[ \t\r\n]*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block boundaries → newline before tags are stripped
    (r"(?is)</(?:" + _BLOCK_TAGS + r")[ \t\r\n]*>|<br[ \t\r\n]*/?[ \t\r\n]*>", "\n"),
    # every remaining tag (open, close, void, doctype)
    (r"(?s)<[^>]*>", ""),
]

# literal replaces, applied in order (&amp; last, per the standard unescape
# ordering — otherwise "&amp;lt;" would double-decode)
ENTITY_STEPS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

# whitespace normalization — explicit classes, NOT \s (Java's \s includes
# \x0B, RE2's does not; explicit classes make the two engines byte-equal)
WS_STEPS: list[tuple[str, str]] = [
    (r"[\t\r\f\x0b]", " "),      # all horizontal controls → space
    (r" +", " "),                # space runs → one space
    (r" *\n[\n ]*", "\n"),       # ws runs containing a newline → one newline
    (r"^[\n ]+|[\n ]+$", ""),    # trim both ends
]


# --- Spark side (pure JVM expression chain) ----------------------------------

def extracted_text(html: str | Column = "html") -> Column:
    """html:binary → extracted text, as a single codegen'd JVM expression."""
    col = F.col(html) if isinstance(html, str) else html
    col = col.cast("string")  # UTF-8 decode
    for pat, repl in REGEX_STEPS:
        col = F.regexp_replace(col, pat, repl)
    for a, b in ENTITY_STEPS:
        col = F.replace(col, F.lit(a), F.lit(b))
    for pat, repl in WS_STEPS:
        col = F.regexp_replace(col, pat, repl)
    return col


def with_extracted_text(
    df: DataFrame, html: str = "html", out: str = "text_extracted"
) -> DataFrame:
    return df.withColumn(out, extracted_text(html))


def escape_html(text: str | Column = "text") -> Column:
    """Minimal HTML escape (& < >) — inverse of the entity-decode steps."""
    col = F.col(text) if isinstance(text, str) else text
    col = F.replace(col, F.lit("&"), F.lit("&amp;"))
    col = F.replace(col, F.lit("<"), F.lit("&lt;"))
    return F.replace(col, F.lit(">"), F.lit("&gt;"))


def wrap_html(text: str | Column = "text") -> Column:
    """text → synthetic Common-Crawl page body (html:binary), escaped so
    extract(wrap(text)) round-trips byte-identically."""
    return F.concat(
        F.lit("<html><body><p>"), escape_html(text), F.lit("</p></body></html>")
    ).cast("binary")


# --- DuckDB oracle side (same step table → SQL string) -----------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_str(s: str) -> str:
    """A replacement string as a DuckDB expression (newline via chr(10) —
    DuckDB string literals don't interpret backslash escapes)."""
    if s == "\n":
        return "chr(10)"
    return _sql_quote(s)


def extract_sql(expr: str) -> str:
    """The byte-identical extraction chain over a VARCHAR SQL expression."""
    e = expr
    for pat, repl in REGEX_STEPS:
        e = f"regexp_replace({e}, {_sql_quote(pat)}, {_sql_str(repl)}, 'g')"
    for a, b in ENTITY_STEPS:
        e = f"replace({e}, {_sql_quote(a)}, {_sql_quote(b)})"
    for pat, repl in WS_STEPS:
        e = f"regexp_replace({e}, {_sql_quote(pat)}, {_sql_str(repl)}, 'g')"
    return e


def wrap_sql(expr: str) -> str:
    """SQL mirror of wrap_html (minus the binary cast — the oracle chain
    stays VARCHAR end-to-end; the Spark side round-trips through binary)."""
    esc = f"replace(replace(replace({expr}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    return f"concat('<html><body><p>', {esc}, '</p></body></html>')"

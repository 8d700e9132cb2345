"""html→text extraction: golden cases, cross-engine byte-parity vs the
DuckDB chain, and the north-star invariant — byte-identical extracted text
per url on the synthesized Common-Crawl corpus.

Reference tie-in: the north-star input is (url, warc_ts, html:binary, text,
lang); tantiny itself receives pre-extracted text (lib/tantiny/index.rb —
documents are plain field hashes), so the extraction stage must reproduce
the text column exactly for the index build to be reference-faithful.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from tantiny_spark.pipeline import webtext

GOLDEN = [
    ("plain text only", "plain text only"),
    ("<html><body><p>hello world</p></body></html>", "hello world"),
    ("<HTML><Body class='x'><P>Upper <b>bold</b> case</P></body></HTML>",
     "Upper bold case"),
    ("<p>one</p><p>two</p><div>three</div>", "one\ntwo\nthree"),
    ("<script type='text/javascript'>var x = '<p>not text</p>';</script>after",
     "after"),
    ("<style>p { color: red; }</style>styled", "styled"),
    ("<!-- a <p>comment</p> -->visible", "visible"),
    ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; c",
     "a & b <tag> \"q\" 's' c"),
    # &amp; decodes LAST: "&amp;lt;" is the literal five chars "&lt;"
    ("&amp;lt; stays literal, &lt; decodes", "&lt; stays literal, < decodes"),
    ("line1<br>line2<br/>line3<br />line4", "line1\nline2\nline3\nline4"),
    ("  spaces\t\tand\r\nnewlines  \n\n  here  ", "spaces and\nnewlines\nhere"),
    ("<ul><li>item one</li><li>item two</li></ul>", "item one\nitem two"),
    ("nested <div><span>inline</span> stays</div> flow",
     "nested inline stays\nflow"),
    ("<p>multi\nline\ninside</p>", "multi\nline\ninside"),
    ("<p >spaced attr close</p >", "spaced attr close"),
]


@pytest.fixture(scope="module")
def extracted(spark):
    sdf = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(GOLDEN)], "i int, raw string"
    )
    rows = (
        sdf.withColumn("html", F.col("raw").cast("binary"))
        .withColumn("ext", webtext.extracted_text("html"))
        .select("i", "ext")
        .collect()
    )
    return {r["i"]: r["ext"] for r in rows}


def test_golden_extraction(extracted):
    for i, (raw, want) in enumerate(GOLDEN):
        assert extracted[i] == want, f"case {i}: {raw!r}"


def test_duckdb_chain_is_byte_identical(extracted):
    """extract_sql (the contract oracle) matches the Spark chain on every
    golden input — the dialect-pinned regex subset works in both engines."""
    raws = [raw for raw, _ in GOLDEN]
    got = duckdb.connect().execute(
        f"select i, {webtext.extract_sql('raw')} from "
        f"(select unnest(range({len(raws)})) i, unnest($1) raw) order by i",
        [raws],
    ).fetchall()
    for i, ext in got:
        assert ext == extracted[i], f"case {i}"


def test_roundtrip_byte_identical_per_url(spark):
    """North-star invariant: extract(wrap(text)) == text, byte-for-byte,
    for every document of the corpus (whitespace-normalized text)."""
    docs_df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mismatches = (
        docs_df.withColumn("html", webtext.wrap_html("text"))
        .withColumn("ext", webtext.extracted_text("html"))
        .where(F.col("ext") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_roundtrip_survives_html_special_chars(spark):
    """wrap_html escapes & < > so even HTML-looking text round-trips."""
    texts = [
        "a & b",
        "x < y > z",
        "literal <p>not a tag</p> here",
        "&amp; pre-escaped stays &amp;",
        "mix <b>&quot;</b> of everything & more",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = (
        sdf.withColumn("html", webtext.wrap_html("text"))
        .withColumn("ext", webtext.extracted_text("html"))
        .collect()
    )
    for r in rows:
        assert r["ext"] == r["text"]


def test_extraction_is_pure_jvm(spark):
    """No Python stage anywhere: the physical plan must not contain an
    Arrow/Python eval node (scale gate — extraction runs in codegen)."""
    sdf = spark.createDataFrame([("<p>x</p>",)], "raw string")
    plan = (
        sdf.withColumn("html", F.col("raw").cast("binary"))
        .withColumn("ext", webtext.extracted_text("html"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan

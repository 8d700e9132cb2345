"""webclean: boilerplate line removal, Gopher quality flags, URL dedup.

Cross-engine parity with the DuckDB oracle is certified by the contract
rows (`boilerplate`, `gopher_quality`, `url_dedup`); these tests pin the
semantics on hand-built cases the synthetic corpus can't produce (multi-
line docs with bullets/ellipses, URLs exercising each canonicalization
rule) plus a duckdb spot-check of the SQL mirrors.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from tantiny_spark.pipeline import webclean


# ---------------------------------------------------------------------------
# boilerplate line removal
# ---------------------------------------------------------------------------

DOCS = [
    (0, "unique intro zero\nCookie Notice\nbody text zero\nCopyright Footer"),
    (1, "cookie notice\nbody text one\ncopyright footer"),
    (2, "body text two\nCOPYRIGHT FOOTER\n\nanother unique line"),
    (3, "Cookie Notice\nCopyright Footer"),  # all boilerplate -> empty
]


def test_boilerplate_lines_removed(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in webclean.remove_boilerplate_lines(df, min_df=2).collect()
    }
    # 'cookie notice' (2 docs) and 'copyright footer' (3 docs) normalize
    # case-insensitively and drop everywhere; order of survivors holds
    assert out[0] == "unique intro zero\nbody text zero"
    assert out[1] == "body text one"
    # blank lines are never counted as boilerplate and survive
    assert out[2] == "body text two\n\nanother unique line"
    # a fully-boilerplate doc survives as a row with empty text
    assert out[3] == ""


def test_boilerplate_min_df_threshold(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in webclean.remove_boilerplate_lines(df, min_df=4).collect()
    }
    # at min_df=4 only 'copyright footer' (4 docs) is boilerplate;
    # 'cookie notice' (3 docs: 0, 1, 3) survives
    assert out[1] == "cookie notice\nbody text one"
    assert out[3] == "Cookie Notice"


def test_boilerplate_sql_parity(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        tuple(r)
        for r in webclean.remove_boilerplate_lines(df, min_df=2)
        .select("doc_id", "clean_text")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = sorted(con.sql(webclean.boilerplate_sql(2, table="d")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# Gopher quality flags
# ---------------------------------------------------------------------------

GOOD_TEXT = (
    "the quick brown fox jumps over the lazy dog and then runs away with "
    "great speed to find that one special place where all good foxes have "
    "their dens and be safe from harm of any kind whatsoever in the world "
    "today and tomorrow and beyond into the future of all fox generations"
)


def test_gopher_pass_and_word_count(spark):
    df = spark.createDataFrame(
        [(0, GOOD_TEXT), (1, "too short"), (2, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in webclean.with_gopher_flags(df).collect()}
    assert rows[0]["gopher_pass"] is True
    assert rows[0]["n_words"] >= 50 and rows[0]["stopword_hits"] >= 2
    assert rows[1]["gopher_pass"] is False and not rows[1]["g_word_count"]
    assert rows[2]["n_words"] == 0 and rows[2]["gopher_pass"] is False


def test_gopher_bullet_and_ellipsis_fractions(spark):
    bullety = "\n".join(["- item %d" % i for i in range(19)] + ["one normal line"])
    dotty = "tail one...\ntail two…\nplain\nplain too"
    df = spark.createDataFrame([(0, bullety), (1, dotty)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in webclean.with_gopher_flags(df).collect()}
    assert rows[0]["bullet_line_frac"] == 0.95  # 19/20 > 0.9 -> fail
    assert rows[0]["g_bullet"] is False
    assert rows[1]["ellipsis_line_frac"] == 0.5  # both ... and … count
    assert rows[1]["g_ellipsis"] is False


def test_gopher_symbol_ratio_counts_hash_and_ellipsis(spark):
    df = spark.createDataFrame(
        [(0, "a b c # # … ... words here")], ["doc_id", "text"]
    )
    r = webclean.with_gopher_flags(df).collect()[0]
    # 2x'#' + 1x'…' + 1x'...' = 4 symbols over 9 whitespace words
    assert r["symbol_ratio"] == round(4 / 9, 6)
    assert r["g_symbol"] is False


def test_gopher_mean_word_len_bounds(spark):
    short = " ".join(["ab"] * 60)  # mean 2 < 3
    longw = " ".join(["superlongtoken"] * 60)  # mean 14 > 10
    df = spark.createDataFrame([(0, short), (1, longw)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in webclean.with_gopher_flags(df).collect()}
    assert rows[0]["g_mean_len"] is False and rows[0]["mean_word_len"] == 2.0
    assert rows[1]["g_mean_len"] is False and rows[1]["mean_word_len"] == 14.0


def test_gopher_alpha_word_fraction(spark):
    df = spark.createDataFrame(
        [(0, " ".join(["word"] * 7 + ["123", "456", "789"]))],
        ["doc_id", "text"],
    )
    r = webclean.with_gopher_flags(df).collect()[0]
    assert r["alpha_word_frac"] == 0.7
    assert r["g_alpha"] is False


# ---------------------------------------------------------------------------
# Gopher repetition filters
# ---------------------------------------------------------------------------

REP_DOCS = [
    # doc 0: 'spam line' 3x of 4 non-blank lines -> dup_line_frac 0.75
    (0, "spam line\nspam line\nunique a\n\nspam line"),
    # doc 1: all lines unique, but one dominant bigram: 'x y' repeated
    (1, "x y x y x y x y x y x y x y x y x y x y"),
    # doc 2: clean prose, no repetition
    (2, "the quick brown fox jumps over one lazy dog near a quiet river"),
    # doc 3: empty
    (3, ""),
    # doc 4: top-bigram tie ('b b' 2x, 'c c' 2x) -> min gram wins
    (4, "b b b c c c"),
]


def test_repetition_dup_line_fractions(spark):
    df = spark.createDataFrame(REP_DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in webclean.with_repetition_flags(df).collect()}
    assert rows[0]["dup_line_frac"] == 0.75
    # chars: 3*9 dup over 3*9+8 total = 27/35
    assert rows[0]["dup_line_char_frac"] == round(27 / 35, 6)
    assert rows[0]["r_dup_line"] is False and rows[0]["repetition_pass"] is False
    assert rows[2]["dup_line_frac"] == 0.0 and rows[2]["repetition_pass"] is True
    assert rows[3]["dup_line_frac"] == 0.0  # empty doc -> all zeros, passes
    assert rows[3]["repetition_pass"] is True


def test_repetition_top_ngram_char_frac(spark):
    df = spark.createDataFrame(REP_DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in webclean.with_repetition_flags(df).collect()}
    # doc 1: words = [x y]*10, 19 bigrams, top is 'x y' (10x) or 'y x' (9x);
    # top count 10, gram len 3, total chars = 39 -> 30/39
    assert rows[1]["top2_gram_char_frac"] == round(30 / 39, 6)
    assert rows[1]["r_top2_gram"] is False
    # doc 2: every bigram occurs once -> no gram repeats -> 0.0 (the top
    # gram must occur >= 2 times to count), doc passes clean
    assert rows[2]["top2_gram_char_frac"] == 0.0
    assert rows[2]["repetition_pass"] is True
    # doc 4: 'b b' and 'c c' tie at 2 -> lexicographic min 'b b' (len 3),
    # total chars 11 -> 6/11
    assert rows[4]["top2_gram_char_frac"] == round(6 / 11, 6)


def test_repetition_dup_ngram_char_frac(spark):
    df = spark.createDataFrame(REP_DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in webclean.with_repetition_flags(df).collect()}
    # doc 1: 5-grams of the alternating stream all dup ('x y x y x' 8x,
    # 'y x y x y' 8x) -> sum c*len = 16*9 = 144 over 39 chars, capped at 1.0
    assert rows[1]["dup5_gram_char_frac"] == 1.0
    assert rows[1]["r_dup5_gram"] is False
    assert rows[2]["dup5_gram_char_frac"] == 0.0 and rows[2]["r_dup5_gram"] is True


def test_repetition_sql_parity(spark):
    df = spark.createDataFrame(REP_DOCS, ["doc_id", "text"])
    cols = [
        "doc_id", "dup_line_frac", "dup_line_char_frac",
        "top2_gram_char_frac", "top3_gram_char_frac", "top4_gram_char_frac",
        "dup5_gram_char_frac", "dup10_gram_char_frac", "repetition_pass",
    ]
    got = sorted(
        tuple(r) for r in webclean.with_repetition_flags(df).select(*cols).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", REP_DOCS)
    want = sorted(con.sql(webclean.repetition_sql(table="d")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------

CANON_CASES = [
    # scheme/host case + default port + fragment
    ("HTTPS://WWW.Example.COM:443/Path/Page#sec", "https://www.example.com/Path/Page"),
    ("http://example.com:80/a", "http://example.com/a"),
    # non-default port survives
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # tracking params drop, remainder sorts, '?' drops when empty
    ("https://e.com/p?utm_source=x&b=2&a=1", "https://e.com/p?a=1&b=2"),
    ("https://e.com/p?utm_campaign=x&gclid=1&fbclid=2&ref=t", "https://e.com/p"),
    # trailing slash trims on non-root path only
    ("https://e.com/dir/", "https://e.com/dir"),
    ("https://e.com/", "https://e.com/"),
    # path/query case preserved
    ("https://e.com/CaseKept?Q=Up", "https://e.com/CaseKept?Q=Up"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], ["i", "url"]
    )
    got = [
        r["c"]
        for r in df.select(webclean.canonical_url("url").alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert got == [want for _, want in CANON_CASES]


def test_canonical_url_sql_parity():
    con = duckdb.connect()
    con.execute("CREATE TABLE u (url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u, _ in CANON_CASES])
    got = [
        r[0]
        for r in con.sql(
            f"SELECT {webclean.canonical_url_sql('url')} FROM u"
        ).fetchall()
    ]
    assert got == [want for _, want in CANON_CASES]


def test_url_dedup_representative(spark):
    df = spark.createDataFrame(
        [
            (0, "https://e.com/p?utm_source=a"),
            (1, "HTTPS://E.COM/p"),
            (2, "https://e.com/p/"),
            (3, "https://e.com/other"),
        ],
        ["doc_id", "url"],
    )
    rows = {
        r["canon_url"]: r for r in webclean.url_dedup(df).collect()
    }
    assert rows["https://e.com/p"]["n_dups"] == 3
    # lexicographically-smallest raw url is the deterministic representative
    assert rows["https://e.com/p"]["representative_url"] == "HTTPS://E.COM/p"
    assert rows["https://e.com/other"]["n_dups"] == 1

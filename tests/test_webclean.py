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


# ---------------------------------------------------------------------------
# PII detection + scrubbing
# ---------------------------------------------------------------------------

PII_DOCS = [
    (0, "write to bob.smith+x@mail.example.org or admin@sub.host.io today"),
    (1, "server 192.168.0.255 and 10.0.0.1 up, 999.1.1.1 is not an ip"),
    (2, "call +1 (555) 010-7788 or +44 20 7946 0958 now"),
    (3, "no pii here at all"),
    (4, None),
]


def test_pii_counts_and_scrub(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in webclean.with_pii_counts(df).collect()}
    assert rows[0]["n_emails"] == 2 and rows[0]["n_ipv4"] == 0
    assert rows[0]["scrubbed"] == "write to <EMAIL> or <EMAIL> today"
    assert rows[1]["n_ipv4"] == 2  # 999.1.1.1 rejected by the octet pattern
    assert "<IP> and <IP> up" in rows[1]["scrubbed"]
    assert "999" in rows[1]["scrubbed"]
    assert rows[2]["n_phones"] == 2
    assert rows[2]["scrubbed"] == "call <PHONE> or <PHONE> now"
    assert rows[3]["n_emails"] == rows[3]["n_ipv4"] == rows[3]["n_phones"] == 0
    assert rows[4]["scrubbed"] == ""  # null text -> ''


def test_pii_sql_parity(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = sorted(
        tuple(r)
        for r in webclean.with_pii_counts(df)
        .select("doc_id", "n_emails", "n_ipv4", "n_phones", "scrubbed")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", PII_DOCS)
    want = sorted(con.sql(webclean.pii_sql(table="d")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# C4 cleaning filters
# ---------------------------------------------------------------------------

C4_DOCS = [
    # doc 0: mixed lines — only the first survives (terminal punct + 5 words)
    (0, 'this line has five good words.\nshort line.\nno terminal punctuation here at all\nthis has javascript inside it, drop.'),
    # doc 1: three clean sentences on one line + quote-terminated line
    (1, 'one two three four five.\nsix seven eight nine ten!\n"quoted line with five words?"'),
    # doc 2: lorem ipsum page
    (2, 'Lorem Ipsum dolor sit amet here.\nanother good line with five words.'),
    # doc 3: brace page
    (3, 'function foo() { return 1; } ok.\nclean line with five words here.'),
    # doc 4: empty
    (4, ""),
]


def test_c4_line_filter(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in webclean.with_c4_flags(df).collect()}
    assert rows[0]["c4_text"] == "this line has five good words."
    assert rows[0]["c4_min_sentences"] is False  # 1 sentence < 3
    assert rows[1]["c4_text"].count("\n") == 2  # all three lines survive
    assert rows[1]["c4_min_sentences"] is True  # . ! ? = 3 sentence marks
    assert rows[1]["c4_pass"] is True
    assert rows[2]["c4_no_lorem"] is False and rows[2]["c4_pass"] is False
    assert rows[3]["c4_no_brace"] is False and rows[3]["c4_pass"] is False
    assert rows[4]["c4_text"] == "" and rows[4]["c4_pass"] is False


def test_c4_sql_parity(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    cols = ["doc_id", "c4_text", "c4_min_sentences", "c4_no_lorem", "c4_no_brace", "c4_pass"]
    got = sorted(tuple(r) for r in webclean.with_c4_flags(df).select(*cols).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", C4_DOCS)
    want = sorted(con.sql(webclean.c4_sql(table="d")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# corpus-wide paragraph dedup
# ---------------------------------------------------------------------------

PARA_DOCS = [
    (0, "alpha beta\nshared paragraph\ngamma"),
    (1, "shared paragraph\ndelta\nshared paragraph"),
    (2, "epsilon\n\nshared paragraph"),
    (3, ""),
]


def test_dedup_paragraphs_first_wins(spark):
    df = spark.createDataFrame(PARA_DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r["dedup_text"] for r in webclean.dedup_paragraphs(df).collect()}
    # doc 0 holds the first occurrence (doc order): keeps everything
    assert rows[0] == "alpha beta\nshared paragraph\ngamma"
    # doc 1 loses BOTH its copies (first occurrence is doc 0's)
    assert rows[1] == "delta"
    # doc 2 keeps its blank line, loses the shared paragraph
    assert rows[2] == "epsilon\n"
    assert rows[3] == ""


def test_dedup_paragraphs_sql_parity(spark):
    df = spark.createDataFrame(PARA_DOCS, ["doc_id", "text"])
    got = sorted(tuple(r) for r in webclean.dedup_paragraphs(df).select("doc_id", "dedup_text").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", PARA_DOCS)
    want = sorted(con.sql(webclean.dedup_paragraphs_sql(table="d")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# per-host rollup
# ---------------------------------------------------------------------------

HOST_DOCS = [
    (0, "https://a.example/x?utm_source=f", "aaaa"),
    (1, "https://A.Example:443/x", "bb"),
    (2, "http://b.example:8080/y", "cccccc"),
    (3, "https://a.example/z", "d"),
]


def test_host_stats(spark):
    df = spark.createDataFrame(HOST_DOCS, ["doc_id", "url", "text"])
    rows = {r["host"]: r for r in webclean.host_stats(df).collect()}
    a = rows["a.example"]
    assert a["n_pages"] == 3
    assert a["n_urls"] == 2  # utm-stripped + :443-stripped collapse to /x
    assert a["total_chars"] == 7 and a["mean_chars"] == round(7 / 3, 4)
    assert rows["b.example"]["n_pages"] == 1  # port stripped from host


def test_host_stats_sql_parity(spark):
    df = spark.createDataFrame(HOST_DOCS, ["doc_id", "url", "text"])
    got = sorted(tuple(r) for r in webclean.host_stats(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", HOST_DOCS)
    want = sorted(con.sql(webclean.host_stats_sql(table="d")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# physical-plan shapes of the new stages
# ---------------------------------------------------------------------------


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_and_c4_plans_are_pure_jvm(spark):
    """PII scrub and C4 flags must stay one codegen'd Project: no Python
    eval node, no shuffle exchange anywhere."""
    df = spark.createDataFrame([(0, "a b c.")], ["doc_id", "text"])
    for out in (webclean.with_pii_counts(df), webclean.with_c4_flags(df)):
        plan = _physical(out)
        assert "PythonUDF" not in plan and "EvalPython" not in plan
        assert "Exchange" not in plan


def test_dedup_paragraphs_single_agg_shuffle(spark):
    """The paragraph-dedup first-occurrence pass must be a partial-
    aggregatable min-struct groupBy (skew-safe), never a per-key window:
    no Window node, and the firsts side shows a partial_min before the
    exchange."""
    df = spark.createDataFrame(PARA_DOCS, ["doc_id", "text"])
    plan = _physical(webclean.dedup_paragraphs(df))
    assert "Window" not in plan
    assert "partial_min" in plan or "partial_ min".replace(" ", "") in plan


# ---------------------------------------------------------------------------
# domain blocklist
# ---------------------------------------------------------------------------

BLOCK_PAGES = [
    (1, "https://ads.bad.example/x"),       # subdomain of a blocked domain
    (2, "https://bad.example/y"),           # the blocked domain itself
    (3, "https://good.example/z"),
    (4, "http://Sub.Deep.ADS.bad.example:80/q"),  # deep subdomain, mixed case
    (5, "https://notbad.example/k"),        # suffix must match on label edge
    (6, "https://tracker.net/t"),           # second blocklist entry
]
BLOCKLIST = ["bad.example", "tracker.net"]


def test_filter_blocked_hosts(spark):
    df = spark.createDataFrame(BLOCK_PAGES, ["doc_id", "url"])
    blocked = spark.createDataFrame([(d,) for d in BLOCKLIST], ["domain"])
    out = webclean.filter_blocked_hosts(df, blocked)
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 5]
    hosts = {r["doc_id"]: r["host"] for r in out.collect()}
    assert hosts[5] == "notbad.example"  # 'notbad.example' !endswith '.bad.example'


def test_domain_suffixes_label_edges(spark):
    df = spark.createDataFrame([("a.b.example.com",)], ["h"])
    row = df.select(
        webclean.domain_suffixes(F.col("h")).alias("s")
    ).collect()[0]
    # TLD-only suffix excluded
    assert row["s"] == ["a.b.example.com", "b.example.com", "example.com"]


def test_filter_blocked_hosts_sql_parity(spark):
    df = spark.createDataFrame(BLOCK_PAGES, ["doc_id", "url"])
    blocked = spark.createDataFrame([(d,) for d in BLOCKLIST], ["domain"])
    got = sorted(
        tuple(r)
        for r in webclean.filter_blocked_hosts(df, blocked)
        .select("doc_id", "url", "host").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE p (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", BLOCK_PAGES)
    want = sorted(
        con.sql(
            "SELECT doc_id, url, host FROM ("
            + webclean.filter_blocked_hosts_sql("p", BLOCKLIST)
            + ")"
        ).fetchall()
    )
    assert got == want


def test_filter_blocked_hosts_plan_shape(spark):
    """Suffix explode runs on the DISTINCT host set, pages leave via ONE
    left-anti join, no Python, no window."""
    df = spark.createDataFrame(BLOCK_PAGES, ["doc_id", "url"])
    blocked = spark.createDataFrame([(d,) for d in BLOCKLIST], ["domain"])
    plan = (
        webclean.filter_blocked_hosts(df, blocked)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("LeftAnti") == 1
    assert "Window" not in plan and "PythonUDF" not in plan


# ---------------------------------------------------------------------------
# end-to-end cleaning funnel (clean_corpus)
# ---------------------------------------------------------------------------

_GOOD_LINES = (
    "the quick brown fox jumps over one lazy dog while many people watch "
    "quietly from the old wooden bridge today.",
    "a gentle river flows beneath carrying small boats that drift slowly "
    "toward the distant harbor where traders sell fresh fruit.",
    "children laugh and play near tall green trees as the warm summer "
    "wind moves softly across open fields everywhere.",
)
_GOOD = "\n".join(_GOOD_LINES)
# same sentences reordered: passes every per-doc filter, distinct text
_GOOD_B = "\n".join(
    [_GOOD_LINES[2], _GOOD_LINES[0],
     _GOOD_LINES[1][:-1] + " or email bob@example.com today."]
)


def _funnel_corpus(spark):
    rows = [
        (0, "http://a.com/x", _GOOD, "en"),            # kept
        (1, "HTTP://A.com/x/", _GOOD, "en"),           # url_dup of 0
        (2, "http://bad.evil.com/p", _GOOD, "en"),     # blocked_host
        (3, "http://b.com/1", _GOOD, "zh"),            # lang
        (4, "http://b.com/2", "short text.", "en"),    # gopher (word count)
        (5, "http://b.com/3",
         "\n".join([_GOOD_LINES[1]] * 10), "en"),      # repetition (dup lines)
        (6, "http://b.com/4",
         " ".join(w for line in _GOOD_LINES
                  for w in line.replace(".", "").split()),
         "en"),                                        # c4 (no sentences)
        (7, "http://b.com/5", _GOOD, "en"),            # exact_dup of 0
        (8, "http://b.com/6", _GOOD_B, "en"),          # kept, PII-scrubbed
    ]
    return spark.createDataFrame(rows, ["doc_id", "url", "text", "lang"])


def test_clean_corpus_funnel_attribution(spark):
    blocklist = spark.createDataFrame([("evil.com",)], ["domain"])
    clean, report = webclean.clean_corpus(
        _funnel_corpus(spark), blocklist=blocklist, keep_langs=("en",)
    )
    got = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert got == {
        "url_dup": 1, "blocked_host": 1, "lang": 1, "gopher": 1,
        "repetition": 1, "c4": 1, "exact_dup": 1, "kept": 2,
    }
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert set(rows) == {0, 8}
    assert rows[0] == _GOOD  # no PII -> text unchanged
    assert "<EMAIL>" in rows[8] and "bob@example.com" not in rows[8]
    # clean keeps the input columns exactly
    assert clean.columns == ["doc_id", "url", "text", "lang"]


def test_clean_corpus_precedence_first_stage_wins(spark):
    # doc 1 is BOTH a url-dup and non-kept lang: url_dup (earlier) claims it
    rows = [
        (0, "http://a.com/x", _GOOD, "en"),
        (1, "http://A.com/x", _GOOD, "zh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text", "lang"])
    _, report = webclean.clean_corpus(df, keep_langs=("en",))
    got = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert got == {"url_dup": 1, "kept": 1}


def test_clean_corpus_report_sql_parity(spark):
    df = _funnel_corpus(spark)
    _, report = webclean.clean_corpus(df, keep_langs=("en",))  # no blocklist
    got = sorted(
        (r["stage"], r["n_docs"]) for r in report.collect()
    )
    con = duckdb.connect()
    con.register("docs_in", df.toPandas())
    want = sorted(
        tuple(r) for r in con.execute(
            webclean.clean_corpus_report_sql(
                table="docs_in", keep_langs=("en",)
            )
        ).fetchall()
    )
    assert got == want


def test_domain_suffixes_single_label_and_empty_host(spark):
    """Single-label hosts (localhost) and empty hosts (scheme-less URL)
    must yield NO suffixes — not a descending-sequence slice crash."""
    df = spark.createDataFrame(
        [("localhost",), ("",), ("example.com",)], ["h"]
    )
    rows = {r["h"]: r["s"] for r in df.select(
        "h", webclean.domain_suffixes(F.col("h")).alias("s")
    ).collect()}
    assert rows["localhost"] == []
    assert rows[""] == []
    assert rows["example.com"] == ["example.com"]


def test_filter_blocked_hosts_survives_unparseable_urls(spark):
    df = spark.createDataFrame(
        [(1, "http://x.bad.example/a"), (2, "example.com/no-scheme"),
         (3, "http://localhost/x")],
        ["doc_id", "url"],
    )
    blocked = spark.createDataFrame([("bad.example",)], ["domain"])
    out = sorted(r["doc_id"] for r in
                 webclean.filter_blocked_hosts(df, blocked).collect())
    assert out == [2, 3]  # unblockable hosts simply survive


def test_clean_corpus_accounts_null_url_rows(spark):
    """A NULL url must not VANISH from the funnel (the url-dup equi-join
    never matches NULL keys): it flows through under a doc-unique
    sentinel — accounted in the report, never counted as a url_dup."""
    text = "some words here. more words there."
    df = spark.createDataFrame(
        [(1, "http://a.example/x", text, "en"),
         (2, None, text + " different tail.", "en")],
        ["doc_id", "url", "text", "lang"],
    )
    _, report = webclean.clean_corpus(df)
    rows = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert sum(rows.values()) == 2  # both docs accounted, none vanished
    assert rows.get("url_dup", 0) == 0  # the sentinel key is unique

"""Snippet generation (SnippetGenerator-style best-fragment highlighting)."""

import pytest

from tantiny_spark import plan as P
from tantiny_spark.analysis.tokenizers import Tokenizer
from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema
from tantiny_spark.snippet import query_terms, snippets


DOCS = [
    {"id": 1, "text": "zero one two three spark five six seven eight nine "
                      "ten spark spark thirteen fourteen"},
    {"id": 2, "text": "spark at start then filler filler filler"},
    {"id": 3, "text": "nothing relevant here at all"},
]


@pytest.fixture(scope="module")
def idx_and_src(spark, tmp_path_factory):
    s = IndexSchema()
    s.text("text")
    ix = Index(spark, str(tmp_path_factory.mktemp("snip") / "idx"), s)
    with ix.transaction():
        for d in DOCS:
            ix.add(d)
    src = spark.createDataFrame([(d["id"], d["text"]) for d in DOCS],
                                ["id", "text"])
    return ix.reload(), src


def test_best_fragment_and_counts(idx_and_src):
    ix, src = idx_and_src
    q = ix.term_query("text", "spark")
    rows = snippets(ix, q, src, window=5).collect()
    got = {r["id"]: (r["snippet"], r["n_hits"]) for r in rows}
    # doc 1: fragment [10,15) holds two "spark"s, beats [0,5)'s one
    assert got["1"] == ("ten spark spark thirteen fourteen", 2)
    # doc 2 has one hit in its only fragment-with-hits
    assert got["2"] == ("spark at start then filler", 1)
    # non-matching docs aren't in the hit list at all
    assert "3" not in got


def test_zero_hit_doc_gets_empty_snippet(idx_and_src):
    """A scored doc whose field contains NO query term (negation-only
    match) returns snippet='' and n_hits=0 — not its first fragment
    (ADVICE r03)."""
    ix, src = idx_and_src
    q = ~ix.term_query("text", "spark")  # matches doc 3 only
    rows = snippets(ix, q, src, window=5).collect()
    got = {r["id"]: (r["snippet"], r["n_hits"]) for r in rows}
    assert got["3"] == ("", 0)


def test_order_follows_search_ranking(idx_and_src):
    ix, src = idx_and_src
    q = ix.term_query("text", "spark")
    rows = snippets(ix, q, src, window=5).collect()
    assert [r["id"] for r in rows] == ix.search(q)


def test_tie_breaks_to_earliest_fragment(idx_and_src):
    ix, src = idx_and_src
    # "filler" appears 3x in doc 2, all inside fragment 1 ([5,10)) — but
    # craft a tie: "one"/"six" each appear once in fragments 0 and 1 of doc 1
    q = ix.term_query("text", "one") | ix.term_query("text", "six")
    rows = {r["id"]: r for r in snippets(ix, q, src, window=5).collect()}
    assert rows["1"]["snippet"].startswith("zero one two")


def test_stemmer_field_highlights_inflected_words(spark, tmp_path):
    s = IndexSchema()
    s.text("text", tokenizer=Tokenizer.new("stemmer", language="en"))
    ix = Index(spark, str(tmp_path / "idx"), s)
    with ix.transaction():
        ix.add({"id": 1, "text": "the running dogs keep runs and runners"})
    ix.reload()
    src = spark.createDataFrame(
        [(1, "the running dogs keep runs and runners")], ["id", "text"]
    )
    # term queries take the raw (already-analyzed) term, like the reference;
    # the snippet layer maps SURFACE words through the field tokenizer, so
    # the inflected "running"/"runs" highlight against the stem "run"
    q = ix.term_query("text", "run")
    row = snippets(ix, q, src, window=20).collect()[0]
    # "running" and "runs" stem to "run"; "runners" stems to "runner"
    assert row["n_hits"] == 2


def test_query_terms_collects_phrase_and_bool(idx_and_src):
    ix, _ = idx_and_src
    q = (ix.phrase_query("text", "one two") & ix.term_query("text", "ten")
         ) | ~ix.term_query("text", "zero").boost(2.0)
    assert query_terms(ix._as_plan(q, {}), "text") == ["one", "ten", "two", "zero"]


def test_query_terms_walks_dismax_and_const_score(idx_and_src):
    """DisjunctionMax and ConstScore compositions must surface their
    children's terms — otherwise every snippet blanks under the
    n_hits==0 rule despite real hits."""
    ix, src = idx_and_src
    q = ix.dis_max_query(
        [ix.term_query("text", "spark"),
         ix.const_score_query(ix.term_query("text", "ten"), 0.5)],
        tie_breaker=0.1,
    )
    assert query_terms(ix._as_plan(q, {}), "text") == ["spark", "ten"]
    out = {r["id"]: r for r in snippets(ix, q, src).collect()}
    assert out["2"]["n_hits"] >= 1 and "spark" in out["2"]["snippet"]


def test_multi_fragment_highlight(idx_and_src):
    """n_fragments > 1: ES-highlight shape — top fragments by hits,
    returned in document order, n_hits summed over them."""
    ix, src = idx_and_src
    q = ix.term_query("text", "spark")
    rows = snippets(ix, q, src, window=5, n_fragments=2).collect()
    got = {r["id"]: (list(r["fragments"]), r["n_hits"]) for r in rows}
    # doc 1: fragment [10,15) has 2 hits, [0,5) has 1 — selected both,
    # emitted in document order
    assert got["1"] == (
        ["zero one two three spark", "ten spark spark thirteen fourteen"], 3,
    )
    # doc 2: only one fragment has hits — no padding with hitless ones
    assert got["2"] == (["spark at start then filler"], 1)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        snippets(ix, q, src, n_fragments=0)


def test_multi_fragment_zero_hit_doc(idx_and_src):
    ix, src = idx_and_src
    q = ~ix.term_query("text", "relevant") & ix.term_query("text", "spark")
    rows = snippets(ix, q, src, window=5, n_fragments=3).collect()
    assert all(r["n_hits"] > 0 or r["fragments"] == [] for r in rows)

"""Lucene/Tantivy-style query-string parser (tantiny_spark.queryparser)."""

from datetime import datetime

import pytest

from tantiny_spark import plan as P
from tantiny_spark.analysis.tokenizers import Tokenizer
from tantiny_spark.errors import QueryParseError
from tantiny_spark.index import Index
from tantiny_spark.queryparser import parse_query
from tantiny_spark.schema import IndexSchema


def _schema():
    s = IndexSchema()
    s.text("text")
    s.text("en_text", tokenizer=Tokenizer.new("stemmer", language="en"))
    s.string("tag")
    s.integer("n")
    s.date("d")
    return s


# --- pure parse-shape tests (no Spark) -------------------------------------

def test_bare_words_are_should():
    q = parse_query(_schema(), "alpha beta", ["text"])
    assert isinstance(q, P.Disjunction)
    assert q.children == (P.Term("text", "alpha"), P.Term("text", "beta"))


def test_plus_minus_occurs():
    q = parse_query(_schema(), "+alpha beta -gamma", ["text"])
    assert isinstance(q, P.BooleanOccur)
    assert q.must == (P.Term("text", "alpha"),)
    assert q.should == (P.Term("text", "beta"),)
    assert q.must_not == (P.Term("text", "gamma"),)


def test_and_promotes_both_neighbours():
    q = parse_query(_schema(), "alpha AND beta", ["text"])
    assert isinstance(q, P.Conjunction)
    assert set(q.children) == {P.Term("text", "alpha"), P.Term("text", "beta")}


def test_or_and_not_connectors():
    q = parse_query(_schema(), "alpha OR beta NOT gamma", ["text"])
    assert isinstance(q, P.BooleanOccur)
    assert q.must == ()
    assert set(q.should) == {P.Term("text", "alpha"), P.Term("text", "beta")}
    assert q.must_not == (P.Term("text", "gamma"),)


def test_phrase_with_slop_and_field():
    q = parse_query(_schema(), 'text:"alpha beta"~2', ["text"])
    assert q == P.Phrase("text", ("alpha", "beta"), 2)


def test_prefix_fuzzy_boost():
    q = parse_query(_schema(), "alph* beta~ gamma~2 delta^3", ["text"])
    assert isinstance(q, P.Disjunction)
    kids = q.children
    assert kids[0] == P.Prefix("text", "alph")
    assert kids[1] == P.FuzzyTerm("text", "beta", 1)
    assert kids[2] == P.FuzzyTerm("text", "gamma", 2)
    assert kids[3] == P.Boost(P.Term("text", "delta"), 3.0)


def test_range_needs_field_and_parses_types():
    q = parse_query(_schema(), "n:[10 TO 20]", ["text"])
    assert q == P.Range("n", "integer", 10, 20)
    q = parse_query(_schema(), "d:[2026-01-01 TO 2026-02-01]", ["text"])
    assert q == P.Range("d", "date", datetime(2026, 1, 1), datetime(2026, 2, 1))
    with pytest.raises(QueryParseError):
        parse_query(_schema(), "[10 TO 20]", ["text"])


def test_groups_nest():
    q = parse_query(_schema(), "+alpha +(beta OR gamma)", ["text"])
    assert isinstance(q, P.Conjunction)
    sub = q.children[1]
    assert isinstance(sub, P.Disjunction)


def test_multi_default_fields_fan_out():
    q = parse_query(_schema(), "running", ["text", "en_text"])
    assert isinstance(q, P.Disjunction)
    # simple tokenizer keeps the surface form; the stemmer field stems
    assert P.Term("text", "running") in q.children
    assert P.Term("en_text", "run") in q.children


def test_word_analyzing_to_multiple_terms_becomes_phrase():
    q = parse_query(_schema(), "top-level", ["text"])
    assert q == P.Phrase("text", ("top", "level"), 0)


def test_errors():
    with pytest.raises(QueryParseError):
        parse_query(_schema(), "missing:x", ["text"])
    with pytest.raises(QueryParseError):
        parse_query(_schema(), "(unbalanced", ["text"])
    with pytest.raises(QueryParseError):
        parse_query(_schema(), "alpha)", ["text"])
    with pytest.raises(QueryParseError):
        parse_query(_schema(), "n:word", ["text"])  # numeric field, text atom
    assert isinstance(parse_query(_schema(), "", ["text"]), P.Empty)


# --- end-to-end through the engine -----------------------------------------

def test_parse_query_end_to_end(spark, tmp_path):
    s = IndexSchema()
    s.text("text")
    s.integer("n")
    ix = Index(spark, str(tmp_path / "qp"), s)
    with ix.transaction():
        ix.add({"id": 1, "text": "spark merge window", "n": 5})
        ix.add({"id": 2, "text": "spark batch", "n": 15})
        ix.add({"id": 3, "text": "merge alone", "n": 25})
    ix.reload()
    assert sorted(ix.search(ix.parse_query("+spark merge"))) == ["1", "2"]
    assert sorted(ix.search(ix.parse_query("spark -batch"))) == ["1"]
    assert sorted(ix.search(ix.parse_query('"spark merge"'))) == ["1"]
    assert sorted(ix.search(ix.parse_query("n:[10 TO 30]"))) == ["2", "3"]
    assert sorted(ix.search(ix.parse_query("mergex~1"))) == ["1", "3"]
    # optional-scoring: merge lifts doc 1 above doc 2
    hits = ix.search(ix.parse_query("+spark merge"), limit=2)
    assert hits[0] == "1"


def test_not_consumes_and_promotion():
    """'a AND NOT b c': the AND-promotion is consumed by the (already
    prohibited) NOT clause — c stays an optional SHOULD, like Lucene."""
    q = parse_query(_schema(), "spark AND NOT batch merge", ["text"])
    assert isinstance(q, P.BooleanOccur)
    assert q.must == (P.Term("text", "spark"),)
    assert q.must_not == (P.Term("text", "batch"),)
    assert q.should == (P.Term("text", "merge"),)


def test_multi_token_prefix_atom_is_phrase_prefix():
    """A prefix atom the analyzer splits ('data-base*') compiles to a
    PhrasePrefix (leading terms adjacent + trailing prefix), never a bare
    prefix on the last token alone."""
    q = parse_query(_schema(), "data-base*", ["text"])
    assert q == P.PhrasePrefix("text", ("data",), "base")


def test_string_field_atoms_match_raw_values():
    """String fields are ONE exact case-sensitive term: atoms must not be
    analyzed (lang:EN matches stored 'EN'; a hyphenated value stays one
    term, never a phrase that could never match a single-position
    posting)."""
    s = _schema()
    assert parse_query(s, "tag:EN", ["text"]) == P.Term("tag", "EN")
    assert parse_query(s, "tag:in-progress", ["text"]) == P.Term(
        "tag", "in-progress"
    )
    assert parse_query(s, 'tag:"In Progress"', ["text"]) == P.Term(
        "tag", "In Progress"
    )
    assert parse_query(s, "tag:Rel*", ["text"]) == P.Prefix("tag", "Rel")
    assert parse_query(s, "tag:Relx~1", ["text"]) == P.FuzzyTerm(
        "tag", "Relx", 1
    )
    # wildcard atoms keep the raw case on string fields too
    w = parse_query(s, "tag:R?lease", ["text"])
    assert isinstance(w, P.Regex) and w.field == "tag"


def test_fuzzy_atom_with_split_word_requires_all_tokens():
    """'data-base~1' analyzes to two tokens: fuzzy applies per token, ALL
    required — not a silent fuzzy on the first token only."""
    q = parse_query(_schema(), "data-base~1", ["text"])
    assert isinstance(q, P.Conjunction)
    assert set(q.children) == {
        P.FuzzyTerm("text", "data", 1), P.FuzzyTerm("text", "base", 1),
    }

"""Token filters — StopWordFilter and AsciiFoldingFilter (the Tantivy
TokenFilter family, src/tokenizer/stop_word_filter.rs /
ascii_folding_filter.rs)."""

import pytest

from tantiny_spark.analysis.tokenizers import Tokenizer
from tantiny_spark.errors import UnknownTokenizer
from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema


def test_ascii_folding_simple():
    t = Tokenizer.new("simple", ascii_folding=True)
    assert t.terms("Café au lait") == ["cafe", "au", "lait"]
    assert t.terms("straße") == ["strasse"]
    assert t.terms("Œuvre sœur") == ["oeuvre", "soeur"]
    assert t.terms("naïve jalapeño") == ["naive", "jalapeno"]
    # non-Latin scripts pass through unchanged
    assert t.terms("北京 москва") == ["北京", "москва"]
    # off by default
    assert Tokenizer.new("simple").terms("café") == ["café"]


def test_stop_words_simple_and_order_vs_stemmer():
    t = Tokenizer.new("simple", stop_words=["the", "a", "of"])
    assert t.terms("The queen of the hive") == ["queen", "hive"]
    # stop check runs BEFORE stemming: the surface form must match
    st = Tokenizer.new("stemmer", language="en", stop_words=["running"])
    assert st.terms("running runs") == ["run"]
    st2 = Tokenizer.new("stemmer", language="en", stop_words=["run"])
    assert st2.terms("running runs") == ["run", "run"]


def test_folding_after_stemming():
    # folding applies to the FINAL tokens: 'café' stems (unchanged) then
    # folds to 'cafe'
    t = Tokenizer.new("stemmer", language="fr", ascii_folding=True)
    out = t.terms("café")
    assert all(tok.isascii() for tok in out)


def test_ngram_rejects_filters():
    with pytest.raises(UnknownTokenizer):
        Tokenizer.new("ngram", min=2, max=3, stop_words=["a"])
    with pytest.raises(UnknownTokenizer):
        Tokenizer.new("ngram", min=2, max=3, ascii_folding=True)


def test_filters_schema_roundtrip():
    s = IndexSchema()
    s.text("body", tokenizer=Tokenizer.new(
        "simple", stop_words=["the"], ascii_folding=True))
    s2 = IndexSchema.from_json(s.to_json())
    t = s2.tokenizer_for("body")
    assert t.stop_words == ("the",) and t.ascii_folding is True
    assert t.terms("The café") == ["cafe"]


def test_filters_end_to_end(spark, tmp_path):
    s = IndexSchema()
    s.text("body", tokenizer=Tokenizer.new(
        "simple", stop_words=["the", "a"], ascii_folding=True))
    ix = Index(spark, str(tmp_path / "tf"), s)
    with ix.transaction():
        ix.add({"id": 1, "body": "the quick brown fox"})
        ix.add({"id": 2, "body": "Café RÉSUMÉ"})
    ix.reload()
    # accent-insensitive match: ASCII query hits the accented doc (the
    # parser analyzes with the field tokenizer)
    assert ix.search(ix.parse_query("cafe", ["body"])) == ["2"]
    assert ix.search(ix.parse_query("café", ["body"])) == ["2"]
    # stopword removal compacts positions: the phrase matches ACROSS the
    # removed stopword (classic stopped-phrase behavior, documented)
    assert ix.search(ix.phrase_query("body", "quick brown")) == ["1"]
    # the stopword itself is not indexed
    assert ix.search(ix.parse_query("the", ["body"])) == []

"""Round-4 surface growth: SynonymFilter (token→token normalization),
field collapsing (ES collapse), and the composite aggregation (ES
composite — cursor-paginated multi-source buckets)."""

import pytest

from tantiny_spark.analysis.tokenizers import Tokenizer
from tantiny_spark.errors import UnknownTokenizer, UnsupportedField
from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema


# ---------------------------------------------------------------- synonyms


def test_synonym_filter_pure():
    t = Tokenizer.new("simple", synonyms={"Merge": "join", "unify": "join"})
    assert t.terms("We MERGE and unify then split") == [
        "we", "join", "and", "join", "then", "split",
    ]


def test_synonym_applies_before_stemming_after_stop():
    st = Tokenizer.new("stemmer", language="en", synonyms={"merging": "join"})
    # variant rewrites on the surface form, canonical then stems
    assert st.terms("merging joining") == ["join", "join"]
    t = Tokenizer.new("simple", stop_words=["merge"], synonyms={"merge": "join"})
    # stop words run first: a stopped variant never reaches the map
    assert t.terms("merge it") == ["it"]


def test_synonym_validation():
    with pytest.raises(UnknownTokenizer):
        Tokenizer.new("simple", synonyms={"two words": "x"})
    with pytest.raises(UnknownTokenizer):
        Tokenizer.new("simple", synonyms=[("a", "b"), ("a", "c")])
    with pytest.raises(UnknownTokenizer):
        Tokenizer.new("ngram", min=2, max=3, synonyms={"a": "b"})
    # same mapping twice is fine, and spec order does not matter
    a = Tokenizer.new("simple", synonyms=[("b", "c"), ("a", "c")])
    b = Tokenizer.new("simple", synonyms=[("a", "c"), ("b", "c")])
    assert a == b


def test_synonym_schema_roundtrip():
    s = IndexSchema()
    s.text("t", tokenizer=Tokenizer.new("simple", synonyms={"usa": "america"}))
    s2 = IndexSchema.from_json(s.to_json())
    assert s2.field_tokenizers["t"].synonyms == (("usa", "america"),)


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    s = IndexSchema()
    s.text("t", tokenizer=Tokenizer.new("simple", synonyms={"merge": "join"}))
    s.string("lang")
    s.integer("n")
    ix = Index(spark, str(tmp_path_factory.mktemp("syn")) + "/idx", s)
    with ix.transaction():
        ix.add({"id": 1, "t": "we merge tables", "lang": "en", "n": 3})
        ix.add({"id": 2, "t": "we join tables", "lang": "en", "n": 5})
        ix.add({"id": 3, "t": "nothing here", "lang": "de", "n": 1})
        ix.add({"id": 4, "t": "join join merge", "lang": "de", "n": 9})
    ix.reload()
    return ix


def test_synonym_unifies_index_and_query_streams(syn_index):
    ix = syn_index
    # index side: every 'merge' was indexed as 'join'
    assert sorted(ix.search(ix.term_query("t", "join"))) == ["1", "2", "4"]
    # term_query is VERBATIM (reference semantics — Tantivy TermQuery does
    # not analyze), so the variant surface form has no dictionary entry
    assert ix.search(ix.term_query("t", "merge")) == []
    # analyzed query paths map the variant: smart/phrase see the union
    assert sorted(ix.search(ix.smart_query(["t"], "merge"))) == ["1", "2", "4"]
    assert sorted(ix.search(ix.phrase_query("t", "merge tables"))) == ["1", "2"]
    # positions are preserved 1:1 — phrase offsets unaffected by mapping
    assert sorted(ix.search(ix.phrase_query("t", "we join"))) == ["1", "2"]


# ---------------------------------------------------------------- collapse


def test_collapse_basic(syn_index):
    ix = syn_index
    rows = ix.search_collapse(ix.term_query("t", "join"), "lang").collect()
    assert len(rows) == 2
    by_lang = {r["lang"]: r for r in rows}
    assert by_lang["en"]["group_count"] == 2
    assert by_lang["de"]["group_count"] == 1
    # the representative is the group's best (score desc, id asc) hit:
    # en docs 1/2 tie on score (tf=1 BM25, same dl) -> id asc -> '1'
    assert by_lang["en"]["id"] == "1"
    assert rows[0]["score"] >= rows[1]["score"]


def test_collapse_limit_and_order(syn_index):
    ix = syn_index
    rows = ix.search_collapse(ix.term_query("t", "join"), "lang", limit=1).collect()
    assert len(rows) == 1


def test_collapse_rejects_text_field(syn_index):
    with pytest.raises(UnsupportedField):
        syn_index.search_collapse(syn_index.term_query("t", "join"), "t")
    with pytest.raises(ValueError):
        syn_index.search_collapse(
            syn_index.term_query("t", "join"), "lang", limit=0
        )


def test_collapse_plan_has_no_window(syn_index):
    ix = syn_index
    plan = ix.search_collapse(ix.term_query("t", "join"), "lang")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------------- composite


def _composite(ix, size=10, after=None, metrics=None):
    spec = {
        "sources": [
            {"lg": {"terms": {"field": "lang"}}},
            {"nb": {"histogram": {"field": "n", "interval": 4}}},
        ],
        "size": size,
    }
    if after is not None:
        spec["after"] = after
    req = {"pages": {"composite": spec}}
    if metrics:
        req["pages"]["aggs"] = metrics
    return ix.aggregate(req)


def test_composite_first_page(syn_index):
    rows = _composite(
        syn_index, metrics={"avg_n": {"avg": {"field": "n"}}}
    ).collect()
    assert [(r["lg"], r["nb"], r["doc_count"], r["avg_n"]) for r in rows] == [
        ("de", 0.0, 1, 1.0),
        ("de", 8.0, 1, 9.0),
        ("en", 0.0, 1, 3.0),
        ("en", 4.0, 1, 5.0),
    ]


def test_composite_pagination_covers_all_buckets(syn_index):
    # walk pages of size 1 and confirm the concatenation equals one page
    full = [(r["lg"], r["nb"]) for r in _composite(syn_index).collect()]
    seen, after = [], None
    for _ in range(10):
        rows = _composite(syn_index, size=1, after=after).collect()
        if not rows:
            break
        seen += [(r["lg"], r["nb"]) for r in rows]
        after = {"lg": rows[-1]["lg"], "nb": rows[-1]["nb"]}
    assert seen == full


def test_composite_after_filter_is_below_the_groupby(syn_index):
    df = _composite(syn_index, size=2, after={"lg": "de", "nb": 8.0})
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the cursor predicate must appear under the Aggregate, not above it
    agg_pos = plan.find("Aggregate")
    filt_pos = plan.find("Filter")
    assert agg_pos != -1 and filt_pos != -1 and filt_pos > agg_pos, plan


def test_composite_query_restriction(syn_index):
    ix = syn_index
    rows = _composite_q(ix, ix.term_query("t", "join"))
    # docs 1,2,4 match -> buckets (de,8),(en,0),(en,4)
    assert [(r["lg"], r["nb"], r["doc_count"]) for r in rows] == [
        ("de", 8.0, 1), ("en", 0.0, 1), ("en", 4.0, 1),
    ]


def _composite_q(ix, q):
    return ix.aggregate(
        {
            "pages": {
                "composite": {
                    "sources": [
                        {"lg": {"terms": {"field": "lang"}}},
                        {"nb": {"histogram": {"field": "n", "interval": 4}}},
                    ],
                    "size": 10,
                }
            }
        },
        query=q,
    ).collect()


def test_composite_validation(syn_index):
    ix = syn_index
    with pytest.raises(ValueError):
        ix.aggregate({"p": {"composite": {"sources": []}}})
    with pytest.raises(ValueError):
        ix.aggregate(
            {"p": {"composite": {"sources": [{"lg": {"terms": {"field": "lang"}}}],
                                 "size": 0}}}
        )
    with pytest.raises(ValueError):
        # wrong after keys
        ix.aggregate(
            {"p": {"composite": {"sources": [{"lg": {"terms": {"field": "lang"}}}],
                                 "after": {"xx": "de"}}}}
        )
    with pytest.raises(ValueError):
        # composite cannot nest under a bucket agg
        ix.aggregate(
            {"p": {"terms": {"field": "lang"},
                   "aggs": {"c": {"composite": {"sources": [
                       {"nb": {"histogram": {"field": "n", "interval": 4}}}
                   ]}}}}}
        )
    with pytest.raises(UnsupportedField):
        ix.aggregate(
            {"p": {"composite": {"sources": [{"x": {"terms": {"field": "nope"}}}]}}}
        )
    with pytest.raises(ValueError, match="top_hits"):
        # composite + top_hits must fail with the clean message, not a
        # KeyError deep in the top_hits builder
        ix.aggregate(
            {"p": {"composite": {"sources": [{"lg": {"terms": {"field": "lang"}}}]},
                   "aggs": {"h": {"top_hits": {
                       "size": 3, "sort": [{"n": "desc"}]}}}}}
        )
    with pytest.raises(ValueError, match="unsupported params"):
        # ES knobs this build doesn't implement fail loud, never silently
        # change the bucket stream
        ix.aggregate(
            {"p": {"composite": {"sources": [
                {"lg": {"terms": {"field": "lang", "order": "desc"}}}
            ]}}}
        )
    with pytest.raises(ValueError, match="unsupported params"):
        ix.aggregate(
            {"p": {"composite": {"sources": [
                {"lg": {"terms": {"field": "lang", "missing_bucket": True}}}
            ]}}}
        )


def test_collapse_matches_naive_rank_on_seeded_corpus(spark, tmp_path_factory):
    """Randomized (seeded) cross-check: search_collapse's min-struct
    groupBy must equal the naive per-group rank over the full scored
    set."""
    import random

    rng = random.Random(42)
    words = ["spark", "merge", "join", "batch", "window", "hash"]
    langs = ["en", "de", "es", "fr"]
    docs = [
        {
            "id": i,
            "t": " ".join(rng.choices(words, k=rng.randint(3, 12))),
            "lang": rng.choice(langs),
        }
        for i in range(80)
    ]
    s = IndexSchema()
    s.text("t")
    s.string("lang")
    ix = Index(spark, str(tmp_path_factory.mktemp("clp")) + "/idx", s)
    with ix.transaction():
        for d in docs:
            ix.add(d)
    ix.reload()

    full = ix.search_df(ix.term_query("t", "spark"), limit=10_000).collect()
    by_id = {d["id"]: d for d in docs}
    naive = {}
    for r in sorted(full, key=lambda r: (-r["score"], r["id"])):
        lang = by_id[int(r["id"])]["lang"]
        if lang not in naive:
            naive[lang] = {"id": r["id"], "score": r["score"], "n": 0}
        naive[lang]["n"] += 1
    got = ix.search_collapse(
        ix.term_query("t", "spark"), "lang", limit=10
    ).collect()
    assert len(got) == len(naive)
    for r in got:
        exp = naive[r["lang"]]
        assert r["id"] == exp["id"]
        assert abs(r["score"] - exp["score"]) < 1e-12
        assert r["group_count"] == exp["n"]
    # ranked by representative score desc, id asc
    keys = [(-r["score"], r["id"]) for r in got]
    assert keys == sorted(keys)

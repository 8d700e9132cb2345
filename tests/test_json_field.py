"""JSON-object field tests — path expansion, typed terms, per-(doc,field)
fieldnorms, query compilation onto the existing plan algebra, and the
parser's dotted ``attrs.color:red`` syntax (Tantivy json-field family,
tantivy src/schema/json_object_options.rs)."""

import json

import pytest

from tantiny_spark import plan as P
from tantiny_spark.analysis.jsonpath import (
    JSON_SEP,
    encode_typed,
    json_postings,
    walk_json,
)
from tantiny_spark.analysis.tokenizers import Tokenizer
from tantiny_spark.errors import QueryParseError, UnsupportedField
from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema


# --------------------------------------------------------------------------
# pure-Python layer: walk + encode
# --------------------------------------------------------------------------

def test_walk_json_paths_and_arrays():
    obj = {"a": {"b": "x"}, "tags": ["t1", "t2"], "n": 3, "z": None}
    got = list(walk_json(obj))
    assert got == [("a.b", "x"), ("tags", "t1"), ("tags", "t2"), ("n", 3)]


def test_walk_json_rejects_non_object_root_and_bad_keys():
    with pytest.raises(ValueError, match="object at the root"):
        list(walk_json([1, 2]))
    with pytest.raises(ValueError, match="contains '.'"):
        list(walk_json({"a.b": 1}))


def test_encode_typed_markers():
    assert encode_typed(True) == ("b", "true")  # bool BEFORE int
    assert encode_typed(7) == ("i", "7")
    assert encode_typed(2.0) == ("i", "2")  # integral float → int term
    assert encode_typed(2.5) == ("f", "2.5")
    with pytest.raises(ValueError):
        encode_typed(float("nan"))


def test_json_postings_positions_and_norm():
    tok = Tokenizer.default()
    acc, n = json_postings(
        json.dumps({"title": "spark spark merge", "meta": {"k": 5}}), tok
    )
    assert n == 3
    assert acc[f"title{JSON_SEP}sspark"] == [0, 1]
    assert acc[f"title{JSON_SEP}smerge"] == [2]
    assert acc[f"meta.k{JSON_SEP}i5"] == [0]


def test_json_postings_multivalue_gap():
    # positions continue across array elements with a 1-gap, so a phrase
    # can never straddle two values of the same path
    tok = Tokenizer.default()
    acc, n = json_postings(json.dumps({"t": ["a b", "c d"]}), tok)
    assert acc[f"t{JSON_SEP}sa"] == [0]
    assert acc[f"t{JSON_SEP}sb"] == [1]
    assert acc[f"t{JSON_SEP}sc"] == [3]  # gap: position 2 is skipped
    assert acc[f"t{JSON_SEP}sd"] == [4]
    assert n == 4


def test_json_postings_malformed_fails_loud():
    with pytest.raises(ValueError, match="malformed"):
        json_postings("{not json", Tokenizer.default())


# --------------------------------------------------------------------------
# engine round trip
# --------------------------------------------------------------------------

@pytest.fixture()
def jix(spark, tmp_path):
    s = IndexSchema()
    s.text("body")
    s.json("attrs")
    ix = Index(spark, str(tmp_path / "jix"), s)
    docs = [
        {"id": "d1", "body": "spark merge engine",
         "attrs": {"title": "spark merge engine",
                   "meta": {"lang": "en", "stars": 7, "hot": True}}},
        {"id": "d2", "body": "merge merge merge",
         "attrs": {"title": "merge merge merge",
                   "meta": {"lang": "de", "stars": 3, "hot": False},
                   "tags": ["alpha beta", "gamma delta"]}},
        {"id": "d3", "body": "plain text here",
         "attrs": {"title": "plain text here",
                   "meta": {"lang": "en", "stars": 7.0}}},
    ]
    with ix.transaction():
        for d in docs:
            ix.add(d)
    ix.reload()
    return ix


def test_json_term_nested_path(jix):
    assert sorted(jix.search(jix.json_term_query("attrs", "meta.lang", "en"),
                             limit=10)) == ["d1", "d3"]
    assert jix.search(jix.json_term_query("attrs", "meta.lang", "de"),
                      limit=10) == ["d2"]


def test_json_typed_terms(jix):
    # int leaf; 7.0 canonicalizes to the SAME term as 7 at build and query
    assert sorted(jix.search(jix.json_term_query("attrs", "meta.stars", 7),
                             limit=10)) == ["d1", "d3"]
    assert sorted(jix.search(jix.json_term_query("attrs", "meta.stars", 7.0),
                             limit=10)) == ["d1", "d3"]
    assert jix.search(jix.json_term_query("attrs", "meta.hot", True),
                      limit=10) == ["d1"]
    # text interpretation of '7' does NOT match the typed term
    assert jix.search(jix.json_term_query("attrs", "meta.stars", "7"),
                      limit=10) == []


def test_json_text_scores_match_text_field(spark, tmp_path):
    """BM25 parity invariant: a json field whose ONLY leaf mirrors a text
    field has the same dl / avgdl / df for that leaf's tokens, so the
    per-doc scores of a json term query must EQUAL the text-field term
    query's — the json fieldnorm model collapses to the text one."""
    s = IndexSchema()
    s.text("body")
    s.json("j")
    ix = Index(spark, str(tmp_path / "par"), s)
    texts = ["spark merge engine", "merge merge merge", "plain text here"]
    with ix.transaction():
        for i, t in enumerate(texts):
            ix.add({"id": f"d{i}", "body": t, "j": {"t": t}})
    ix.reload()
    body = dict(ix.search_with_scores(ix.term_query("body", "merge"), limit=10))
    js = dict(ix.search_with_scores(
        ix.json_term_query("j", "t", "merge"), limit=10))
    assert body.keys() == js.keys() and len(body) == 2
    for k in body:
        assert abs(body[k] - js[k]) < 1e-9


def test_json_phrase_within_leaf_and_multivalue_gap(jix):
    assert jix.search(jix.json_phrase_query("attrs", "title", "spark merge"),
                      limit=10) == ["d1"]
    # "alpha beta" and "gamma delta" are separate array values: a phrase
    # across the value boundary must NOT match
    assert jix.search(jix.json_phrase_query("attrs", "tags", "beta gamma"),
                      limit=10) == []
    assert jix.search(jix.json_phrase_query("attrs", "tags", "gamma delta"),
                      limit=10) == ["d2"]
    # multi-token str value through json_term_query → implicit phrase
    assert jix.search(jix.json_term_query("attrs", "title", "plain text"),
                      limit=10) == ["d3"]


def test_json_prefix_and_exists(jix):
    assert jix.search(jix.json_prefix_query("attrs", "title", "spa"),
                      limit=10) == ["d1"]
    assert jix.search(jix.json_exists_query("attrs", "tags"), limit=10) == ["d2"]
    assert sorted(jix.search(jix.json_exists_query("attrs", "meta.hot"),
                             limit=10)) == ["d1", "d2"]
    # whole-field exists via postings presence
    assert sorted(jix.search(jix.exists_query("attrs"), limit=10)) == [
        "d1", "d2", "d3"]


def test_json_parser_dotted_syntax(jix):
    assert sorted(jix.search(jix.parse_query("attrs.meta.lang:en", ["body"]),
                             limit=10)) == ["d1", "d3"]
    # numeric word ORs the typed interpretation in (Tantivy parser behavior)
    assert sorted(jix.search(jix.parse_query("attrs.meta.stars:7", ["body"]),
                             limit=10)) == ["d1", "d3"]
    assert jix.search(jix.parse_query("attrs.meta.hot:true", ["body"]),
                      limit=10) == ["d1"]
    assert jix.search(jix.parse_query('attrs.title:"spark merge"', ["body"]),
                      limit=10) == ["d1"]
    assert jix.search(jix.parse_query("attrs.title:spa*", ["body"]),
                      limit=10) == ["d1"]
    assert jix.search(jix.parse_query("attrs.tags:*", ["body"]),
                      limit=10) == ["d2"]
    # composes with the boolean algebra
    assert jix.search(
        jix.parse_query("attrs.meta.lang:en AND NOT attrs.meta.stars:7",
                        ["body"]), limit=10) == []
    with pytest.raises(QueryParseError, match="not one"):
        jix.parse_query("body.x:y", ["body"])


def test_json_query_requires_json_field(jix):
    with pytest.raises(UnsupportedField):
        P.json_term_query(jix.schema, "body", "x", "y")


def test_json_struct_column_add_dataframe(spark, tmp_path):
    """add_dataframe with a STRUCT column: to_json is applied at ingest."""
    from pyspark.sql import functions as F

    s = IndexSchema()
    s.json("attrs")
    ix = Index(spark, str(tmp_path / "jsix"), s)
    df = spark.range(3).select(
        F.col("id").cast("string").alias("id"),
        F.struct(
            F.concat(F.lit("w"), F.col("id")).alias("word"),
            F.col("id").alias("n"),
        ).alias("attrs"),
    )
    ix.add_dataframe(df)
    ix.reload()
    assert ix.search(ix.json_term_query("attrs", "word", "w1"), limit=10) == ["1"]
    assert ix.search(ix.json_term_query("attrs", "n", 2), limit=10) == ["2"]


def test_json_malformed_value_fails_loud(spark, tmp_path):
    s = IndexSchema()
    s.json("attrs")
    ix = Index(spark, str(tmp_path / "jbad"), s)
    with pytest.raises(Exception, match="malformed"):
        with ix.transaction():
            ix.add({"id": "x", "attrs": "{broken"})


def test_json_range_query(jix):
    # stars: d1=7(int), d2=3(int), d3=7.0 (canonicalizes to the int term)
    assert sorted(jix.search(jix.json_range_query("attrs", "meta.stars", (5, 9)),
                             limit=10)) == ["d1", "d3"]
    assert jix.search(jix.json_range_query("attrs", "meta.stars", (1, 3)),
                      limit=10) == ["d2"]
    # inclusive both ends
    assert sorted(jix.search(jix.json_range_query("attrs", "meta.stars", (3, 7)),
                             limit=10)) == ["d1", "d2", "d3"]
    assert jix.search(jix.json_range_query("attrs", "meta.stars", (8, 99)),
                      limit=10) == []
    # text leaves never match a numeric range
    assert jix.search(jix.json_range_query("attrs", "title", (0, 1e9)),
                      limit=10) == []
    from tantiny_spark.errors import UnsupportedRange
    with pytest.raises(UnsupportedRange):
        jix.json_range_query("attrs", "meta.stars", ("a", "b"))


def test_json_range_with_float_terms(spark, tmp_path):
    s = IndexSchema()
    s.json("j")
    ix = Index(spark, str(tmp_path / "jr"), s)
    with ix.transaction():
        ix.add({"id": "a", "j": {"x": 1.5}})
        ix.add({"id": "b", "j": {"x": 2}})
        ix.add({"id": "c", "j": {"x": 2.75}})
    ix.reload()
    # mixed int/float terms are one numeric domain
    assert sorted(ix.search(ix.json_range_query("j", "x", (1.5, 2.5)),
                            limit=10)) == ["a", "b"]
    assert ix.search(ix.json_range_query("j", "x", (2.1, 3)),
                     limit=10) == ["c"]


def test_json_parser_range(jix):
    assert sorted(jix.search(jix.parse_query("attrs.meta.stars:[5 TO 9]",
                                             ["body"]), limit=10)) == ["d1", "d3"]
    # date-literal ranges now compile to the typed date-term range (no
    # date leaves in this fixture → empty, not an error)
    assert jix.search(
        jix.parse_query("attrs.meta.stars:[2020-01-01 TO 2021-01-01]",
                        ["body"]), limit=10) == []
    # mixed bounds stay loud
    with pytest.raises(QueryParseError):
        jix.parse_query("attrs.meta.stars:[5 TO 2021-01-01]", ["body"])


# --------------------------------------------------------------------------
# date leaves (Tantivy json date inference — RFC3339 strings become typed
# date terms; reference date parse src/index.rs:173-174)
# --------------------------------------------------------------------------

def test_parse_rfc3339_strictness():
    from tantiny_spark.analysis.jsonpath import parse_rfc3339_micros

    assert parse_rfc3339_micros("2026-01-01T00:00:00Z") == 1767225600000000
    assert parse_rfc3339_micros("2026-01-01T01:00:00+01:00") == 1767225600000000
    assert parse_rfc3339_micros("2026-01-01T00:00:00.5Z") == 1767225600500000
    # NOT inferred: bare dates, partial times, plain words, numbers
    for s in ("2026-01-01", "2026-01-01T00:00", "spark", "17672256",
              "2026-01-01T00:00:00"):  # no offset → not RFC3339
        assert parse_rfc3339_micros(s) is None


def test_json_postings_date_leaf_is_typed_term_not_text():
    tok = Tokenizer.default()
    acc, n = json_postings(
        json.dumps({"when": "2026-01-01T00:00:00Z", "title": "spark"}), tok
    )
    assert n == 1  # only 'spark'; the date leaf is not a text token
    assert acc[f"when{JSON_SEP}d1767225600000000"] == [0]
    assert f"when{JSON_SEP}s2026" not in acc


@pytest.fixture()
def dix(spark, tmp_path):
    s = IndexSchema()
    s.text("body")
    s.json("j")
    ix = Index(spark, str(tmp_path / "dix"), s)
    with ix.transaction():
        ix.add({"id": "a", "j": {"when": "2020-06-01T12:00:00Z", "k": "x"}})
        ix.add({"id": "b", "j": {"when": "2021-03-15T00:00:00Z"}})
        ix.add({"id": "c", "j": {"when": "not a date 2020-06-01"}})
    ix.reload()
    return ix


def test_json_date_term_equality(dix):
    from datetime import datetime, timezone

    dt = datetime(2020, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
    assert dix.search(dix.json_term_query("j", "when", dt), limit=10) == ["a"]
    # naive datetimes are UTC (the date fast-field convention)
    assert dix.search(
        dix.json_term_query("j", "when", datetime(2021, 3, 15)), limit=10
    ) == ["b"]


def test_json_date_range(dix):
    from datetime import date, datetime

    q = dix.json_range_query(
        "j", "when", (datetime(2020, 1, 1), datetime(2020, 12, 31))
    )
    assert dix.search(q, limit=10) == ["a"]
    # inclusive ends; date objects accepted
    q = dix.json_range_query("j", "when",
                             (date(2020, 6, 1), date(2021, 3, 15)))
    assert sorted(dix.search(q, limit=10)) == ["a", "b"]
    # a date range never matches number or text terms
    assert dix.search(
        dix.json_range_query("j", "when", (datetime(2026, 1, 1),
                                           datetime(2027, 1, 1))), limit=10
    ) == []
    from tantiny_spark.errors import UnsupportedRange
    with pytest.raises(UnsupportedRange, match="both"):
        dix.json_range_query("j", "when", (5, datetime(2021, 1, 1)))


def test_json_date_parser_syntax(dix):
    got = dix.search(
        dix.parse_query("j.when:[2020-01-01 TO 2021-01-01]", ["body"]), limit=10
    )
    assert got == ["a"]
    got = dix.search(
        dix.parse_query("j.when:[2020-01-01 TO 2021-03-15T00:00:00]", ["body"]),
        limit=10,
    )
    assert sorted(got) == ["a", "b"]


def test_json_date_leaf_does_not_affect_fieldnorm(spark, tmp_path):
    """Two docs with identical text leaves, one with an extra date leaf:
    BM25 over the json text must be identical (date terms are typed, not
    tokens — they never count toward the per-(doc,field) fieldnorm)."""
    s = IndexSchema()
    s.json("j")
    ix = Index(spark, str(tmp_path / "nrm"), s)
    with ix.transaction():
        ix.add({"id": "p", "j": {"t": "spark merge"}})
        ix.add({"id": "q", "j": {"t": "spark merge",
                                 "when": "2020-01-01T00:00:00Z"}})
    ix.reload()
    rows = ix.search_df(ix.json_term_query("j", "t", "spark"),
                        limit=10).collect()
    scores = {r["id"]: r["score"] for r in rows}
    assert scores["p"] == scores["q"]


def test_json_survives_merge(jix):
    jix.delete("d3")
    jix.reload()
    jix.merge_segments()
    jix.reload()
    assert jix.search(jix.json_term_query("attrs", "meta.lang", "en"),
                      limit=10) == ["d1"]
    assert jix.search(jix.json_phrase_query("attrs", "tags", "gamma delta"),
                      limit=10) == ["d2"]

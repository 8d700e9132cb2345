"""Nested aggregation requests (Tantivy aggregation module,
src/aggregation/mod.rs: ES-style bucket aggs carrying metric sub-aggs),
compiled by tantiny_spark.aggs to one groupBy / one global pass."""

import pytest

from tantiny_spark.errors import UnsupportedField
from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    s = IndexSchema()
    s.text("text")
    s.string("tag")
    s.integer("n")
    idx = Index(spark, str(tmp_path_factory.mktemp("nagg") / "idx"), s)
    with idx.transaction():
        for i, (txt, tag, n) in enumerate(
            [
                ("spark a", "x", 10),
                ("spark b", "x", 20),
                ("spark c", "y", 30),
                ("other d", "y", 40),
                ("other e", "z", None),
            ]
        ):
            idx.add({"id": i, "text": txt, "tag": tag, "n": n})
    return idx.reload()


def test_terms_with_metric_subaggs(ix):
    out = ix.aggregate(
        {"tags": {"terms": {"field": "tag"},
                  "aggs": {"avg_n": {"avg": {"field": "n"}},
                           "sum_n": {"sum": {"field": "n"}}}}}
    ).collect()
    rows = {r["tags"]: (r["doc_count"], r["avg_n"], r["sum_n"]) for r in out}
    assert rows == {
        "x": (2, 15.0, 30.0),
        "y": (2, 35.0, 70.0),
        "z": (1, None, None),  # doc 4's n is null: count 1, no values
    }
    # key-ordered output
    assert [r["tags"] for r in out] == ["x", "y", "z"]


def test_terms_stats_expansion_and_query(ix):
    out = ix.aggregate(
        {"tags": {"terms": {"field": "tag"},
                  "aggs": {"n": {"stats": {"field": "n"}}}}},
        query=ix.term_query("text", "spark"),
    ).collect()
    got = {r["tags"]: r.asDict() for r in out}
    assert set(got) == {"x", "y"}
    assert got["x"]["n_count"] == 2 and got["x"]["n_sum"] == 30.0
    assert got["x"]["n_min"] == 10.0 and got["x"]["n_max"] == 20.0
    assert got["y"]["doc_count"] == 1 and got["y"]["n_avg"] == 30.0


def test_terms_sized_root_is_topk(ix):
    out = ix.aggregate(
        {"words": {"terms": {"field": "text", "size": 2}}}
    ).collect()
    # spark(3) and other(2) are the two most frequent terms
    assert [(r["words"], r["doc_count"]) for r in out] == [
        ("spark", 3), ("other", 2)
    ]


def test_nested_terms_buckets(ix):
    out = ix.aggregate(
        {"words": {"terms": {"field": "text"},
                   "aggs": {"tags": {"terms": {"field": "tag"}},
                            }}},
        query=ix.term_query("text", "spark"),
    ).collect()
    pairs = {(r["words"], r["tags"]): r["doc_count"] for r in out}
    # docs 0,1,2 tokens × their tags
    assert pairs[("spark", "x")] == 2
    assert pairs[("spark", "y")] == 1
    assert pairs[("a", "x")] == 1
    # flat output is ordered by (root key, child key)
    keys = [(r["words"], r["tags"]) for r in out]
    assert keys == sorted(keys)


def test_histogram_root_with_cardinality(ix):
    out = ix.aggregate(
        {"h": {"histogram": {"field": "n", "interval": 25},
               "aggs": {"tags_n": {"cardinality": {"field": "n"}}}}}
    ).collect()
    got = {r["h"]: (r["doc_count"], r["tags_n"]) for r in out}
    # 10,20 -> bucket 0; 30,40 -> bucket 25; null n excluded
    assert got == {0.0: (2, 2), 25.0: (2, 2)}


def test_range_root_with_metrics(ix):
    out = ix.aggregate(
        {"r": {"range": {"field": "n",
                         "ranges": [{"to": 25}, {"from": 25}]},
               "aggs": {"mx": {"max": {"field": "n"}},
                        "cnt": {"value_count": {"field": "n"}}}}}
    ).collect()
    got = {r["r"]: (r["doc_count"], r["mx"], r["cnt"]) for r in out}
    assert got == {"*-25.0": (2, 20.0, 2), "25.0-*": (2, 40.0, 2)}


def test_extended_stats_population_moments(ix):
    out = ix.aggregate(
        {"tags": {"terms": {"field": "tag"},
                  "aggs": {"n": {"extended_stats": {"field": "n"}}}}}
    ).collect()
    got = {r["tags"]: r.asDict() for r in out}
    # tag x: values 10, 20 -> pop variance 25, std 5
    assert got["x"]["n_variance"] == 25.0
    assert got["x"]["n_std_deviation"] == 5.0
    assert got["x"]["n_avg"] == 15.0
    # single value -> zero variance; all-null -> null moments
    assert got["z"]["n_variance"] is None


def test_terms_order_by_metric(ix):
    out = ix.aggregate(
        {"tags": {"terms": {"field": "tag", "size": 2,
                            "order": {"sum_n": "desc"}},
                  "aggs": {"sum_n": {"sum": {"field": "n"}}}}}
    ).collect()
    # sums: y=70, x=30, z=None -> top-2 by sum desc
    assert [(r["tags"], r["sum_n"]) for r in out] == [("y", 70.0), ("x", 30.0)]
    out = ix.aggregate(
        {"tags": {"terms": {"field": "tag", "order": {"_key": "desc"}}}}
    ).collect()
    assert [r["tags"] for r in out] == ["z", "y", "x"]


def test_terms_missing_buckets_nulls(ix):
    out = ix.aggregate(
        {"ns": {"terms": {"field": "n", "missing": -1}}}
    ).collect()
    got = {r["ns"]: r["doc_count"] for r in out}
    assert got == {-1: 1, 10: 1, 20: 1, 30: 1, 40: 1}
    with pytest.raises(ValueError):  # postings-routed terms can't see nulls
        ix.aggregate({"t": {"terms": {"field": "tag", "missing": "none"}}})


def test_validation_errors(ix):
    with pytest.raises(ValueError):  # two roots
        ix.aggregate({"a": {"terms": {"field": "tag"}},
                      "b": {"terms": {"field": "tag"}}})
    with pytest.raises(ValueError):  # metric root
        ix.aggregate({"a": {"avg": {"field": "n"}}})
    with pytest.raises(UnsupportedField):
        ix.aggregate({"a": {"terms": {"field": "missing"}}})
    with pytest.raises(ValueError):  # size inside a nested request
        ix.aggregate({"a": {"terms": {"field": "tag", "size": 3},
                            "aggs": {"b": {"terms": {"field": "text"}}}}})
    with pytest.raises(ValueError):  # parent-level metrics beside a child
        ix.aggregate({"a": {"terms": {"field": "tag"},
                            "aggs": {"m": {"avg": {"field": "n"}},
                                     "b": {"terms": {"field": "text"}}}}})
    with pytest.raises(ValueError):  # range cannot nest
        ix.aggregate({"a": {"range": {"field": "n", "ranges": [{"to": 1}]},
                            "aggs": {"b": {"terms": {"field": "tag"}}}}})
    with pytest.raises(ValueError):  # 3-level nesting
        ix.aggregate({"a": {"terms": {"field": "tag"}, "aggs": {
            "b": {"terms": {"field": "text"}, "aggs": {
                "c": {"terms": {"field": "tag"}}}}}}})


def test_plan_is_single_aggregate(ix, spark):
    """The whole nested request is ONE partial-aggregatable groupBy: the
    physical plan contains exactly one exchange below the final order and
    no window/sort-merge per bucket."""
    df = ix.aggregate(
        {"tags": {"terms": {"field": "tag"},
                  "aggs": {"s": {"stats": {"field": "n"}}}}}
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # one hashaggregate pair (partial + final) for the bucket groupBy
    assert plan.count("HashAggregate") <= 4


def test_top_hits_per_bucket(ix):
    """Tantivy TopHitsAggregation: per tag, the single highest-n doc.
    z's only doc has a null sort value and is skipped (fast-field
    collector semantics), so z emits no bucket."""
    out = ix.aggregate(
        {"tags": {"terms": {"field": "tag"},
                  "aggs": {"best": {"top_hits": {
                      "size": 1, "sort": [{"n": "desc"}]}}}}}
    ).collect()
    assert [(r["tags"], r["hit_rank"], r["id"], r["n"]) for r in out] == [
        ("x", 1, "1", 20), ("y", 1, "3", 40),
    ]


def test_top_hits_paging_and_query_scope(ix):
    out = ix.aggregate(
        {"tags": {"terms": {"field": "tag"},
                  "aggs": {"h": {"top_hits": {
                      "size": 2, "sort": [{"n": "asc"}]}}}}},
        query=ix.term_query("text", "spark"),
    ).collect()
    assert [(r["tags"], r["hit_rank"], r["id"]) for r in out] == [
        ("x", 1, "0"), ("x", 2, "1"), ("y", 1, "2"),
    ]
    # from= skips hits but keeps the ABSOLUTE in-bucket rank
    page = ix.aggregate(
        {"tags": {"terms": {"field": "tag"},
                  "aggs": {"h": {"top_hits": {
                      "size": 1, "from": 1, "sort": [{"n": "asc"}]}}}}},
        query=ix.term_query("text", "spark"),
    ).collect()
    assert [(r["tags"], r["hit_rank"], r["id"]) for r in page] == [
        ("x", 2, "1")
    ]


def test_top_hits_validation(ix):
    base = {"terms": {"field": "tag"}}
    with pytest.raises(ValueError):  # sort is mandatory and single-key
        ix.aggregate({"t": {**base, "aggs": {"h": {"top_hits": {"size": 1}}}}})
    with pytest.raises(ValueError):  # no sibling metrics beside top_hits
        ix.aggregate({"t": {**base, "aggs": {
            "h": {"top_hits": {"size": 1, "sort": [{"n": "desc"}]}},
            "m": {"avg": {"field": "n"}}}}})
    with pytest.raises(UnsupportedField):  # sort needs a numeric fast field
        ix.aggregate({"t": {**base, "aggs": {"h": {"top_hits": {
            "size": 1, "sort": [{"text": "desc"}]}}}}})
    with pytest.raises(ValueError):  # range roots have no key to rank within
        ix.aggregate({"t": {"range": {"field": "n", "ranges": [{"to": 5}]},
                            "aggs": {"h": {"top_hits": {
                                "size": 1, "sort": [{"n": "desc"}]}}}}})


def test_top_hits_rejects_sized_root_and_name_collisions(ix):
    th = {"top_hits": {"size": 1, "sort": [{"n": "desc"}]}}
    with pytest.raises(ValueError):  # size/order need the counts groupBy
        ix.aggregate({"t": {"terms": {"field": "tag", "size": 2},
                            "aggs": {"h": th}}})
    with pytest.raises(ValueError):  # root name shadows the sort column
        ix.aggregate({"n": {"terms": {"field": "tag"}, "aggs": {"h": th}}})
    with pytest.raises(ValueError):  # root name collides with the id join
        ix.aggregate({"id": {"terms": {"field": "tag"}, "aggs": {"h": th}}})

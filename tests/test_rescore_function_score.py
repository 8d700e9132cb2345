"""Two-phase rescoring (ES rescore) and field-value-factor scoring
(ES function_score)."""

import math

import pytest

from tantiny_spark.errors import UnsupportedField
from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema


@pytest.fixture(scope="module")
def fs_index(spark, tmp_path_factory):
    s = IndexSchema()
    s.text("t")
    s.integer("pr")
    ix = Index(spark, str(tmp_path_factory.mktemp("fs")) + "/idx", s)
    with ix.transaction():
        ix.add({"id": 1, "t": "spark merge fast", "pr": 100})
        ix.add({"id": 2, "t": "spark slow thing", "pr": 1})
        ix.add({"id": 3, "t": "spark merge quick", "pr": 10})
        ix.add({"id": 4, "t": "other words here", "pr": 1000})
        ix.add({"id": 5, "t": "spark no rank here"})  # pr missing
    ix.reload()
    return ix


def test_rescore_adds_weighted_secondary(fs_index):
    ix = fs_index
    base = dict(ix.search_with_scores(ix.term_query("t", "spark")))
    rows = ix.rescore(
        ix.term_query("t", "spark"), ix.phrase_query("t", "spark merge"),
        window_size=10, weight=2.0,
    ).collect()
    got = {r["id"]: r["score"] for r in rows}
    # non-phrase hits keep the primary score exactly
    assert got["2"] == base["2"]
    assert got["5"] == base["5"]
    # phrase hits gained 2x the phrase score; they outrank the rest
    assert got["1"] > base["1"] and got["3"] > base["3"]
    assert {rows[0]["id"], rows[1]["id"]} == {"1", "3"}


def test_rescore_window_bounds_candidates(fs_index):
    ix = fs_index
    # window_size=1 keeps only the single best primary hit (id asc on ties)
    rows = ix.rescore(
        ix.term_query("t", "spark"), ix.phrase_query("t", "spark merge"),
        window_size=1, weight=2.0, limit=1,
    ).collect()
    assert len(rows) == 1
    with pytest.raises(ValueError):
        ix.rescore(
            ix.term_query("t", "spark"), ix.term_query("t", "merge"),
            window_size=5, limit=10,
        )
    with pytest.raises(ValueError):
        ix.rescore(
            ix.term_query("t", "spark"), ix.term_query("t", "merge"),
            window_size=0,
        )


def test_function_score_multiply_log1p(fs_index):
    ix = fs_index
    base = dict(ix.search_with_scores(ix.term_query("t", "spark")))
    rows = ix.function_score(
        ix.term_query("t", "spark"), "pr", modifier="log1p",
    ).collect()
    got = {r["id"]: r["score"] for r in rows}
    for i, pr in (("1", 100), ("2", 1), ("3", 10)):
        assert abs(got[i] - base[i] * math.log1p(pr)) < 1e-9
    # missing field value -> missing=0.0 -> log1p(0)=0 -> score 0
    assert got["5"] == 0.0
    # ranking follows the combined score
    assert rows[0]["id"] == "1"


def test_function_score_sum_and_missing(fs_index):
    ix = fs_index
    base = dict(ix.search_with_scores(ix.term_query("t", "spark")))
    rows = ix.function_score(
        ix.term_query("t", "spark"), "pr", factor=0.5, boost_mode="sum",
        missing=4.0,
    ).collect()
    got = {r["id"]: r["score"] for r in rows}
    assert abs(got["1"] - (base["1"] + 50.0)) < 1e-9
    assert abs(got["5"] - (base["5"] + 2.0)) < 1e-9


def test_function_score_validation(fs_index):
    ix = fs_index
    with pytest.raises(UnsupportedField):
        ix.function_score(ix.term_query("t", "spark"), "t")
    with pytest.raises(ValueError):
        ix.function_score(ix.term_query("t", "spark"), "pr", modifier="exp")
    with pytest.raises(ValueError):
        ix.function_score(ix.term_query("t", "spark"), "pr", boost_mode="max")


def test_rescore_plan_keeps_secondary_off_the_corpus(fs_index):
    """The rescore join's left side is the bounded window (GlobalLimit),
    so the plan must show a limit below the join."""
    ix = fs_index
    df = ix.rescore(
        ix.term_query("t", "spark"), ix.phrase_query("t", "spark merge"),
        window_size=7, limit=5,
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    join_pos = plan.find("Join")
    limit_pos = plan.find("GlobalLimit", join_pos)
    assert join_pos != -1 and limit_pos != -1, plan


def test_term_vector(fs_index):
    ix = fs_index
    rows = ix.term_vector(4, "t").collect()
    got = {r["term"]: (r["tf"], list(r["positions"])) for r in rows}
    # doc 4: "other words here"
    assert got == {"other": (1, [0]), "words": (1, [1]), "here": (1, [2])}
    # terms come back term-asc
    assert [r["term"] for r in rows] == sorted(got)
    # unknown doc -> empty frame with the contract schema
    empty = ix.term_vector("nope", "t")
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == ["term", "tf", "positions"]
    import pytest
    from tantiny_spark.errors import UnsupportedField
    with pytest.raises(UnsupportedField):
        ix.term_vector(4, "pr")  # integer fields have no term vector

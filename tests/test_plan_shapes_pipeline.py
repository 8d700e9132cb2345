"""Physical-plan regressions for the round-3 pipeline additions: the scale
properties the docstrings claim, asserted so refactors can't lose them."""

import pytest

from tantiny_spark.pipeline import prep, spans, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 5} common common", "en" if i % 2 else "de")
            for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stratified_sample_is_one_narrow_filter(docs):
    """No join, no shuffle, no Python: the rates fold into a literal CASE
    inside a codegen'd Filter."""
    plan = _physical(prep.stratified_sample(docs, rates={"en": 0.5}))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_unigram_bits_shuffles_are_aggregations_only(docs):
    """The only broadcast is the 1-row total; tf pre-aggregation carries a
    map-side partial_count before every exchange; no Python in the path."""
    plan = _physical(textstats.with_unigram_bits(docs))
    assert "partial_count" in plan
    assert "Python" not in plan and "Arrow" not in plan
    # exactly one broadcast exchange — the single-row corpus total
    assert plan.count("BroadcastExchange") == 1


def test_duplicate_spans_gram_stats_aggregate_partially(docs):
    """The per-gram (count, first-key) aggregation must fold map-side
    (partial_min/partial_count) — the Zipf-head gram never materializes an
    occurrence list — and the interval-merge window is partitioned by the
    doc key, never a global sort."""
    plan = _physical(spans.duplicate_spans(docs, k=2))
    assert "partial_min" in plan and "partial_count" in plan
    assert "windowspecdefinition(doc_id" in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_remove_spans_join_keeps_corpus_side_unbroadcast(docs):
    """The rewrite joins spans per doc; the corpus side must never be the
    broadcast side (spans aggregate to <= one row per affected doc)."""
    plan = _physical(spans.remove_duplicate_spans(docs, k=2))
    # the corpus scan feeds the streamed side of the join — assert the plan
    # didn't put the raw docs relation under a BroadcastExchange
    assert "Python" not in plan and "Arrow" not in plan

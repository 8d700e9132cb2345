"""Plan-shape tests for executor._dict_expansion's two regimes.

VERDICT round 1 flagged the unbounded driver collect: a pathological
pattern (1-char prefix over a web-scale dictionary) would materialize
millions of terms into the driver. The fix caps the literal path at
MAX_EXPANSION_LITERALS and falls back to a distributed semi-join — these
tests pin both plan shapes.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tantiny_spark.executor import MAX_EXPANSION_LITERALS, SearchContext, _dict_expansion


@pytest.fixture(scope="module")
def big_dict_ctx(spark):
    n = MAX_EXPANSION_LITERALS + 5_000
    terms = [f"a{i:06d}" for i in range(n)]
    dictionary = spark.createDataFrame(
        pd.DataFrame({"field": "text", "term": terms, "df": 1})
    )
    postings = spark.createDataFrame(
        pd.DataFrame(
            {
                "field": "text",
                "term": terms,
                "doc_id": range(n),
                "tf": 1,
                "positions": [[0]] * n,
                "norm_id": 1,
            }
        )
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n), "id": [f"{i:06d}" for i in range(n)]})
    )
    stats = spark.createDataFrame(
        pd.DataFrame(
            {"field": ["text"], "num_docs": [n], "total_tokens": [n], "avgdl": [1.0]}
        )
    )
    return SearchContext(
        docs=docs, postings=postings, dictionary=dictionary, stats=stats
    )


def _analyzed_plan(df) -> str:
    # the analyzed plan shows the program shape before the optimizer
    # constant-folds LocalRelation test data away
    return df._jdf.queryExecution().analyzed().toString()


def test_pathological_prefix_uses_semi_join_not_driver_collect(big_dict_ctx):
    out = _dict_expansion(big_dict_ctx, "text", F.col("term").startswith("a"))
    plan = _analyzed_plan(out)
    # distributed fallback: a semi-join against the dictionary slice, and no
    # giant IN-literal list baked into the plan
    assert "LeftSemi" in plan, plan
    assert "a000500" not in plan  # no literal enumeration
    assert out.count() == MAX_EXPANSION_LITERALS + 5_000


def test_typical_prefix_keeps_literal_pushdown(big_dict_ctx):
    out = _dict_expansion(big_dict_ctx, "text", F.col("term").startswith("a00000"))
    plan = _analyzed_plan(out)
    # 10 matched terms → isin literals (term-level pushdown), no join
    assert "LeftSemi" not in plan, plan
    assert "a000001" in plan, plan  # the literals are in the filter
    assert out.count() == 10

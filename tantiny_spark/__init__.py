"""tantiny_spark — a PySpark-native distributed inverted-index + BM25 engine.

From-scratch reimplementation of the capabilities of baygeldin/tantiny
(a Ruby embedding of Tantivy) on Spark DataFrames: the index is a set of
Parquet/Iceberg tables, queries are DataFrame programs, per-row hot paths are
vectorized Arrow/pandas UDFs, and the driver owns a small query-algebra
planner. See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"

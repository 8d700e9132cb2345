from tantiny_spark.analysis import porter2, snowball_ru  # noqa: F401

__all__ = ["porter2", "snowball_ru"]

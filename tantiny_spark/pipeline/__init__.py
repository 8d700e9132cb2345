from tantiny_spark.pipeline import dedup, multimodal, similarity, textstats  # noqa: F401

__all__ = ["dedup", "multimodal", "similarity", "textstats"]

"""Batched query execution matches per-query search()."""

from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema


def test_search_many_matches_individual(spark, tmp_path):
    s = IndexSchema()
    s.text("t")
    idx = Index(spark, str(tmp_path / "idx"), s)
    with idx.transaction():
        for i in range(30):
            idx.add({"id": i, "t": f"alpha beta{' gamma' * (i % 4)} w{i % 7}"})
    idx.reload()

    queries = {
        "q_alpha": idx.term_query("t", "alpha"),
        "q_gamma": idx.term_query("t", "gamma"),
        "q_bool": idx.term_query("t", "alpha") & idx.term_query("t", "w3"),
        "q_smart": "alpha gam",
        "q_none": idx.term_query("t", "zzz"),
    }
    batch = idx.search_many(queries, limit=5)
    for name, q in queries.items():
        assert batch[name] == idx.search(q, limit=5), name

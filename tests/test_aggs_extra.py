"""Range / percentiles / cardinality aggregations (Tantivy aggregations
module family: RangeAggregation, PercentilesAggregation,
CardinalityAggregation)."""

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
    idx = Index(spark, str(tmp_path_factory.mktemp("agg2") / "idx"), s)
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


def test_range_agg_counts(ix):
    rows = ix.range_agg("n", [(None, 15), (15, 35), (35, None)]).collect()
    got = {r["range_key"]: r["n_docs"] for r in rows}
    assert got == {"*-15.0": 1, "15.0-35.0": 2, "35.0-*": 1}
    # half-open [from, to): 20 falls in [15,35), not [35,*)
    assert rows[0]["from_val"] is None and rows[0]["to_val"] == 15.0


def test_range_agg_overlap_and_query(ix):
    rows = ix.range_agg(
        "n", [(0, 100), (15, 25)], ix.term_query("text", "spark")
    ).collect()
    got = {r["range_key"]: r["n_docs"] for r in rows}
    # matched set = docs 0,1,2 (n=10,20,30); overlapping ranges both count
    assert got == {"0.0-100.0": 3, "15.0-25.0": 1}


def test_range_agg_validation(ix):
    with pytest.raises(UnsupportedField):
        ix.range_agg("text", [(0, 1)])
    with pytest.raises(ValueError):
        ix.range_agg("n", [])


def test_percentiles_exact(ix):
    rows = ix.percentiles("n", (0, 50, 100)).collect()
    got = {r["percent"]: r["value"] for r in rows}
    # values 10,20,30,40 (null excluded): linear interpolation
    assert got == {0.0: 10.0, 50.0: 25.0, 100.0: 40.0}


def test_percentiles_with_query_and_approx(ix):
    rows = ix.percentiles(
        "n", (50,), ix.term_query("text", "spark")
    ).collect()
    assert rows[0]["value"] == 20.0  # median of 10,20,30
    # approx path returns a value from the set (t-digest on tiny data is exact)
    rows = ix.percentiles("n", (50,), approx=True).collect()
    assert rows[0]["value"] in (20.0, 25.0, 30.0)
    with pytest.raises(ValueError):
        ix.percentiles("n", (150,))


def test_cardinality(ix):
    # text field: distinct terms across matched docs
    assert ix.cardinality("text") == 7  # spark,a,b,c,other,d,e
    assert ix.cardinality("text", ix.term_query("text", "spark")) == 4
    # string field: distinct stored values
    assert ix.cardinality("tag") == 3
    # numeric: distinct non-null values
    assert ix.cardinality("n") == 4
    # approx HLL++ is close on tiny sets
    assert ix.cardinality("tag", exact=False) == 3
    with pytest.raises(UnsupportedField):
        ix.cardinality("missing")

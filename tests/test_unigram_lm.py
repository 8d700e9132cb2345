"""Unigram-LM bits-per-token scoring and deterministic stratified sampling."""

import math

import pytest

from tantiny_spark.pipeline import prep, textstats


def test_unigram_bits_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
        for r in textstats.with_unigram_bits(df).collect()
    }
    # corpus counts: a=2, b=2, c=1, total=5
    def bits(t):
        return -math.log2({"a": 2, "b": 2, "c": 1}[t] / 5.0)

    assert got[1][0] == 3
    assert got[1][1] == pytest.approx((2 * bits("a") + bits("b")) / 3, abs=1e-6)
    assert got[2][1] == pytest.approx((bits("b") + bits("c")) / 2, abs=1e-6)
    assert 3 not in got  # zero-token docs produce no row


def test_unigram_bits_frozen_model(spark):
    """A frozen reference-corpus model scores a different corpus (CCNet
    setup); out-of-vocab tokens COUNT, at the add-one smoothed maximum
    surprisal -log2(1/total) (ADVICE r03: they were silently dropped)."""
    ref = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    model = textstats.unigram_counts(ref)  # a=3, b=1, total=4
    new = spark.createDataFrame([(9, "a b zzz")], ["doc_id", "text"])
    row = textstats.with_unigram_bits(new, model=model).collect()[0]
    # zzz is out-of-vocab -> smoothed count 1, cost -log2(1/4)
    want = (-math.log2(3 / 4) + -math.log2(1 / 4) + -math.log2(1 / 4)) / 3
    assert row["n_tokens"] == 3
    assert row["bits_per_token"] == pytest.approx(want, abs=1e-6)


def test_unigram_bits_all_oov_doc_gets_row(spark):
    """A doc made entirely of OOV tokens still produces a row at the
    model's maximum surprisal instead of vanishing."""
    ref = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    model = textstats.unigram_counts(ref)  # total=4
    new = spark.createDataFrame([(9, "zzz yyy")], ["doc_id", "text"])
    row = textstats.with_unigram_bits(new, model=model).collect()[0]
    assert row["n_tokens"] == 2
    assert row["bits_per_token"] == pytest.approx(math.log2(4), abs=1e-6)


def test_rare_token_soup_scores_higher(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(9)]
    rows.append((99, "zyx qwv jkl pqr mno"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["bits_per_token"]
           for r in textstats.with_unigram_bits(df).collect()}
    assert got[99] > got[0]


def test_perplexity_bucket_terciles(spark):
    """Six docs with strictly increasing bits split 2/2/2 across
    head/middle/tail at the default tercile cuts (Wenzek et al. 2020
    §3.3 semantics: low bits = head = most stereotypical)."""
    common = "the the the the the the the the"
    rows = [
        (1, common),
        (2, common + " quick"),
        (3, common + " quick brown"),
        (4, common + " quick brown fox"),
        (5, common + " quick brown fox jumps"),
        (6, common + " quick brown fox jumps over"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["bits_per_token"], r["ppl_bucket"])
        for r in textstats.with_perplexity_bucket(df).collect()
    }
    assert len(got) == 6
    # bits strictly increase with doc_id (more rare-token mass per token)
    bits = [got[i][0] for i in range(1, 7)]
    assert bits == sorted(bits) and len(set(bits)) == 6
    assert [got[i][1] for i in range(1, 7)] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]


def test_perplexity_bucket_approx_and_custom_cuts(spark):
    """approx=True (t-digest) lands the same buckets on well-separated
    data; custom cuts/labels give a head-heavy 75/25 split."""
    common = "the the the the the the the the"
    rows = [(i, common + " " + " ".join(f"w{i}x{j}" for j in range(i)))
            for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # approx (t-digest) picks an actual data value as threshold where exact
    # interpolates, so boundary docs may shift a bucket — but the labeling
    # must stay monotone in bits (doc_id order here) and use every label
    approx = [r["ppl_bucket"] for r in textstats.with_perplexity_bucket(
        df, approx=True).orderBy("bits_per_token").collect()]
    order = {"head": 0, "middle": 1, "tail": 2}
    ranks = [order[b] for b in approx]
    assert ranks == sorted(ranks) and set(approx) == {"head", "middle", "tail"}
    two = {r["doc_id"]: r["ppl_bucket"]
           for r in textstats.with_perplexity_bucket(
               df, cuts=(0.75,), labels=("keep", "drop")).collect()}
    assert sum(1 for v in two.values() if v == "keep") == 6
    assert sum(1 for v in two.values() if v == "drop") == 2


def test_perplexity_bucket_validates_args(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        textstats.with_perplexity_bucket(df, cuts=())
    with pytest.raises(ValueError):
        textstats.with_perplexity_bucket(df, cuts=(0.9, 0.1))
    with pytest.raises(ValueError):
        textstats.with_perplexity_bucket(df, cuts=(0.0, 0.5))
    with pytest.raises(ValueError):
        textstats.with_perplexity_bucket(df, cuts=(0.5,), labels=("a", "b", "c"))


def test_perplexity_bucket_plan_has_no_window(spark):
    """The bucketing must stay a broadcast-threshold CASE — never a global
    sort or Window over the corpus."""
    df = spark.createDataFrame([(1, "a b"), (2, "b c")], ["doc_id", "text"])
    plan = textstats.with_perplexity_bucket(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_stratified_sample_deterministic_and_monotone(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(400)], ["doc_id", "lang"]
    )
    lo = prep.stratified_sample(df, rates={"en": 0.3}, default_rate=0.5)
    hi = prep.stratified_sample(df, rates={"en": 0.6}, default_rate=1.0)
    lo_ids = {r["doc_id"] for r in lo.collect()}
    # determinism: a re-run keeps exactly the same rows
    assert {r["doc_id"] for r in lo.collect()} == lo_ids
    # monotonicity: raising every rate only ADDS rows (append-stable mixes)
    assert lo_ids <= {r["doc_id"] for r in hi.collect()}
    # rates are roughly honored per stratum
    en = sum(1 for r in lo_ids if r % 2)
    de = len(lo_ids) - en
    assert 0.15 < en / 200 < 0.45
    assert 0.35 < de / 200 < 0.65


def test_stratified_sample_validates_rates(spark):
    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError):
        prep.stratified_sample(df, rates={"en": 1.5})
    with pytest.raises(ValueError):
        prep.stratified_sample(df, rates={}, default_rate=-0.1)

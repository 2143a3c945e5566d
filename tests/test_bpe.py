"""BPE merge semantics — the string-level contract behind q_bpe_train.

The oracle parity suite certifies cross-engine equality; these tests
pin the SEMANTICS: the two-pass padded replace merges every
non-overlapping occurrence (including alternating chains a single
pass misses), and single-token representations stop contributing
pairs without tripping Spark's descending sequence().
"""

from __future__ import annotations

from pyspark.sql import functions as F

from processor_spark.operators.bpe import _merge_rep, _pair_counts


def _apply(spark, rep: str, pair: str) -> str:
    df = spark.createDataFrame([(rep,)], "rep string")
    return df.select(_merge_rep(F.col("rep"), F.lit(pair)).alias("m")).head()[0]


def test_merge_catches_alternating_chain(spark):
    # one leftmost-non-overlapping pass merges only every other
    # occurrence ('a b a b' — the consumed separator hides the next
    # match); the second pass must catch the survivors
    assert _apply(spark, "a b a b a b a b", "a b") == "ab ab ab ab"
    assert _apply(spark, "a b a b a b", "a b") == "ab ab ab"


def test_merge_is_token_boundary_safe(spark):
    # 'a b' must not merge inside 'xa b' tokens — padding guarantees
    # whole-token matches only
    assert _apply(spark, "xa b a b", "a b") == "xa b ab"
    assert _apply(spark, "ab a b", "a b") == "ab ab"


def test_merge_leaves_unrelated_reps_untouched(spark):
    assert _apply(spark, "c d e", "a b") == "c d e"
    assert _apply(spark, "a", "a b") == "a"


def test_pair_counts_skip_single_token_reps(spark):
    reps = spark.createDataFrame(
        [("ab", 5, "ab"), ("abc", 2, "ab c"), ("cab", 1, "c ab")],
        "word string, wcnt long, rep string",
    )
    got = {r["pair"]: r["wsum"] for r in _pair_counts(reps).collect()}
    assert got == {"ab c": 2, "c ab": 1}


def test_pair_counts_weight_overlapping_occurrences(spark):
    # 'a a a' has two (a,a) pairs — each occurrence counts
    reps = spark.createDataFrame([("aaa", 3, "a a a")], "word string, wcnt long, rep string")
    got = _pair_counts(reps).collect()
    assert {(r["pair"], r["wsum"]) for r in got} == {("a a", 6)}

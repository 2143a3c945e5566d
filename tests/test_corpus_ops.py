"""Invariant tests for the training-pipeline operators (SURVEY.md §2.10+).

Oracle parity already pins exact values; these pin the *algebraic*
properties that make the ops safe to run incrementally at 100 TB:
splits partition the corpus deterministically, the global shuffle is a
permutation, decontamination only flags docs that truly share a gram,
and attribution never credits more revenue than was spent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from processor_spark import registry
from processor_spark.sources import load
from tests.conftest import SF_SMALL

registry.load_all_modules()


def _run(spark, key, sf=SF_SMALL):
    return registry.get(key).fn(spark, sf)


def test_dataset_split_partitions_every_doc_once(spark):
    n_docs = load(spark, SF_SMALL, "documents").count()
    hist = _run(spark, "q_dataset_split").collect()
    assert sum(r.n_docs for r in hist) == n_docs  # exhaustive, no overlap
    by_split = {}
    for r in hist:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) == {"train", "val", "test"}
    # 80/10/10 within tolerance (multiplicative hash is uniform-ish)
    assert by_split["train"] / n_docs == pytest.approx(0.8, abs=0.08)


def test_dataset_split_is_stable_across_runs(spark):
    a = {(r.source, r.split): r.n_docs for r in _run(spark, "q_dataset_split").collect()}
    b = {(r.source, r.split): r.n_docs for r in _run(spark, "q_dataset_split").collect()}
    assert a == b


def test_global_shuffle_is_a_permutation(spark):
    rows = _run(spark, "q_global_shuffle").collect()
    n = load(spark, SF_SMALL, "documents").count()
    assert len(rows) == n
    assert sorted(r.shuffle_pos for r in rows) == list(range(1, n + 1))
    # deterministic: same permutation on a re-run
    again = {r.doc_id: r.shuffle_pos for r in _run(spark, "q_global_shuffle").collect()}
    assert all(again[r.doc_id] == r.shuffle_pos for r in rows)
    # and genuinely shuffled: not the identity order
    by_id = sorted(rows, key=lambda r: r.doc_id)
    assert [r.shuffle_pos for r in by_id] != sorted(r.shuffle_pos for r in by_id)


def test_contamination_flags_only_real_overlaps(spark):
    flagged = _run(spark, "q_contamination")
    assert flagged.where(F.col("shared_grams") < 1).count() == 0
    docs = load(spark, SF_SMALL, "documents")
    eval_ids = {r.doc_id for r in docs.where(F.col("source") == "src0").select("doc_id").collect()}
    assert not eval_ids & {r.doc_id for r in flagged.select("doc_id").collect()}


def test_attribution_conserves_revenue(spark):
    e = load(spark, SF_SMALL, "events")
    total = (
        e.where(F.col("event_type") == "purchase").agg(F.sum("value")).collect()[0][0]
    )
    n_purchases = e.where(F.col("event_type") == "purchase").count()
    att = _run(spark, "q_attribution").collect()
    assert sum(r.n_purchases for r in att) <= n_purchases  # unmatched get no credit
    assert sum(r.attributed_revenue for r in att) <= total + 1e-6


def test_gap_fill_locf_carries_forward_not_backward(spark):
    rows = _run(spark, "q_gap_fill_locf").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        seen_value = False
        for r in series:
            if r.value_ff is not None:
                seen_value = True
            else:
                # NULLs only allowed BEFORE the first observation
                assert not seen_value, f"hole after first value at {r.day}"


def test_phrase_candidates_from_index_k3_matches_naive_scan(spark):
    """r8: the generalized k-token positional-index phrase search must
    equal a naive bigram..k-gram scan for a 3-token phrase — proving
    the chained position probe correct beyond the registered 2-token
    key."""
    from pyspark.sql import functions as F

    from processor_spark.operators.text import (
        phrase_candidates_from_index,
        tokens,
    )
    from processor_spark.sources import load
    from tests.conftest import SF_SMALL

    # pick a 3-token phrase that actually occurs: take the first doc
    # with >= 3 tokens and use its tokens [1:4]
    d = load(spark, SF_SMALL, "documents")
    toked = d.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= 4
    )
    row = toked.orderBy("doc_id").first()
    phrase = tuple(row.t[1:4])

    got = {
        r.doc_id
        for r in phrase_candidates_from_index(spark, SF_SMALL, phrase).collect()
    }
    joined = " ".join(phrase)
    want = {
        r.doc_id
        for r in toked.where(
            F.expr(
                "exists(transform(sequence(0, size(t) - 3),"
                f" i -> concat_ws(' ', t[i], t[i+1], t[i+2])), g -> g = '{joined}')"
            )
        ).collect()
    }
    assert row.doc_id in want
    assert got == want, (sorted(got)[:5], sorted(want)[:5])


def test_phrase_candidates_oov_term_returns_empty(spark):
    """r9 (ADVICE r8): a phrase term whose hash bucket directory does
    not exist (out-of-vocabulary token) must answer zero candidates,
    not throw PATH_NOT_FOUND from the partition-pruned read."""
    from processor_spark.operators.text import phrase_candidates_from_index
    from tests.conftest import SF_SMALL

    out = phrase_candidates_from_index(
        spark, SF_SMALL, ("zzz_no_such_token_zzz", "qqq_nor_this_one_qqq")
    )
    assert out.count() == 0
    assert out.columns == ["doc_id"]

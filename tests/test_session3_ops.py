"""Invariant tests for the round-7 session-3 operators, beyond oracle
parity: the content-defined property of CDC chunking, Holt smoothing's
fixed point, and ranking-metric bounds."""

from __future__ import annotations

import datetime

from processor_spark import registry
from tests.conftest import SF_SMALL

registry.load_all_modules()


def _plant_docs(spark, tmp_path, rows):
    """Write a minimal documents.parquet fixture dir (the only table
    q_cdc_chunks reads)."""
    df = spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (text, src) in enumerate(rows)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_cdc_chunks_partition_the_token_stream(spark, tmp_path):
    """sum_toks per source must equal the total token count — the
    chunk boundaries PARTITION the stream, never drop or double-count
    a token."""
    words = ("alpha beta gamma delta epsilon zeta eta theta " * 12).split()
    text = " ".join(words)
    sf = _plant_docs(spark, tmp_path, [(text, "s0")])
    out = registry.get("q_cdc_chunks").fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0].sum_toks == len(words)
    assert out[0].n_chunks >= 1
    assert out[0].max_toks <= len(words)


def test_cdc_chunks_are_shift_invariant(spark, tmp_path):
    """The content-defined property: prepending ONE token to a copy of
    a document must leave most chunk fingerprints shared (an insertion
    disturbs only the chunk it lands in plus at most a window's reach)
    — a fixed-width chunker would shift EVERY boundary and share
    nothing."""
    base = " ".join(f"tok{i % 97} w{(i * 7) % 89}" for i in range(400))
    shifted = "inserted " + base
    sf = _plant_docs(spark, tmp_path, [(base, "s0"), (shifted, "s0")])
    row = registry.get("q_cdc_chunks").fn(spark, sf).collect()[0]
    # duplicated mass: n_chunks - n_distinct chunks are shared between
    # the two near-identical docs; require the majority shared
    shared = row.n_chunks - row.n_distinct
    assert shared >= row.n_chunks // 3, row


def _plant_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        schema="event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_holt_constant_series_is_a_fixed_point(spark, tmp_path):
    """A constant daily series must yield level == the daily value,
    trend == 0, and both forecasts equal to the level — the smoothing
    recurrence's fixed point (l_1 = y, b_1 = 0 is invariant)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=i), 1, "click", 10.0, "{}")
        for i in range(12)
    ]
    sf = _plant_events(spark, tmp_path, rows)
    out = registry.get("q_holt_forecast").fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 12
    assert r.trend_e2 == 0
    assert r.level_e2 == 10 * 100 * 100  # 10.00 -> 1000 cents -> *100
    assert r.fcst1_e2 == r.level_e2 and r.fcst7_e2 == r.level_e2


def test_ndcg_is_bounded_and_ideal_dominates(spark):
    """0 <= NDCG <= 1 and IDCG >= DCG on every query row (the ideal
    ranking is by definition at least as good as the retrieved one)."""
    rows = registry.get("q_ndcg").fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ndcg_e6 <= 1_000_000, r
        assert r.idcg_e12 >= r.dcg_e12, r


def test_map_mrr_bounds_and_consistency(spark):
    """AP and RR live in [0, 1]; a query with no relevant candidate
    reports rank 0 and zero scores; first_hit > 0 implies rr_e6 ==
    1e6 // first_hit (the integer-division definition)."""
    rows = registry.get("q_map_mrr").fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ap_e6 <= 1_000_000, r
        assert 0 <= r.rr_e6 <= 1_000_000, r
        if r.first_hit == 0:
            assert r.rr_e6 == 0
        else:
            assert r.rr_e6 == 1_000_000 // r.first_hit, r

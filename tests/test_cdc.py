"""CDC / SCD2 semantics (operators/cdc.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from processor_spark.operators.cdc import scd2_apply, upsert
from processor_spark.sources import load
from tests.conftest import SF_SMALL


def test_upsert_updates_win_and_inserts_land(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (4, "D")], "k long, v string")
    got = {r.k: r.v for r in upsert(base, updates, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_scd2_closes_and_appends_versions(spark):
    ts = F.lit("2024-01-01 00:00:00").cast("timestamp")
    dim = spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, attr string"
    ).withColumn("valid_from", F.lit("2020-01-01 00:00:00").cast("timestamp")).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    )
    changes = spark.createDataFrame([(1, "x2")], "k long, attr string").withColumn(
        "changed_at", ts
    )
    out = scd2_apply(dim, changes, "k")
    rows = sorted((r.k, r.attr, r.valid_to is None) for r in out.collect())
    # k=1: old version closed + new open version; k=2 untouched (open)
    assert rows == [(1, "x", False), (1, "x2", True), (2, "y", True)]
    closed = out.where("k = 1 AND valid_to IS NOT NULL").first()
    assert closed.valid_to.isoformat() == "2024-01-01T00:00:00"


def test_upsert_on_fixture_preserves_untouched_rows(spark):
    o = load(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    updates = o.limit(0)  # empty batch
    assert upsert(o, updates, "o_orderkey").count() == o.count()

"""Facade tests: the Engine entry points (SURVEY.md §3 EP1/EP2/EP3)."""

from __future__ import annotations

import pytest

from processor_spark.api import Engine
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_SMALL)


def test_collection_and_sql_agree(eng):
    n_df = eng.collection("orders").count()
    n_sql = eng.sql("SELECT count(*) AS n FROM orders").first().n
    assert n_df == n_sql > 0


def test_run_registered_operator(eng):
    out = eng.run("q_pricing_summary")
    assert out.count() == 6


def test_keys_inventory_is_complete(eng):
    keys = eng.keys()
    assert len(keys) >= 60
    assert "q_join_5way" in keys and "q_dedup_minhash" in keys


def test_describe(eng):
    assert Engine.describe("q_join_5way").startswith("q_join_5way:")


def test_unbound_engine_raises(spark):
    with pytest.raises(RuntimeError, match="bind"):
        Engine(spark).collection("orders")


def test_events_view_is_time_ordered(eng):
    ts = [r.ts for r in eng.events().select("ts").limit(100).collect()]
    assert ts == sorted(ts)


def test_grouped_agg_udf_is_window_compatible(spark):
    """The GROUPED_AGG pandas UDF must run .over(Window) — the property
    that distinguishes it from grouped-map applyInPandas (which cannot).
    Every row must carry its partition's trimmed mean, agreeing exactly
    with the groupBy aggregation of the same UDF."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from processor_spark.functions.udx import trimmed_mean_cc
    from processor_spark.sources import load
    from tests.conftest import SF_SMALL

    o = load(spark, SF_SMALL, "orders")
    w = Window.partitionBy("o_orderpriority")
    per_row = o.select(
        "o_orderpriority", trimmed_mean_cc("o_totalprice").over(w).alias("tm")
    ).distinct()
    via_window = {(r.o_orderpriority, r.tm) for r in per_row.collect()}
    via_group = {
        (r.o_orderpriority, r.trimmed_mean_cc)
        for r in o.groupBy("o_orderpriority")
        .agg(trimmed_mean_cc("o_totalprice").alias("trimmed_mean_cc"))
        .collect()
    }
    assert via_window == via_group and len(via_window) == 5


def test_run_observed_metrics_ride_the_same_job(spark):
    """df.observe(): audit metrics (row count, null count, max) must be
    computed as a side effect of the one action, and agree with
    explicitly-computed values."""
    from pyspark.sql import functions as F

    from processor_spark.api import run_observed
    from processor_spark.sources import load
    from tests.conftest import SF_SMALL

    o = load(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    rows, metrics = run_observed(
        o,
        n_rows=F.count(F.lit(1)),
        n_null_price=F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)),
        max_price=F.max("o_totalprice"),
    )
    assert metrics["n_rows"] == len(rows) == o.count()
    assert metrics["n_null_price"] == 0
    assert metrics["max_price"] == o.agg(F.max("o_totalprice")).first()[0]


def test_lakehouse_table_via_facade(eng, spark, tmp_path):
    t = eng.table(str(tmp_path / "lake"))
    t.create(spark, spark.createDataFrame([(1, "a")], "k bigint, v string"), key="k")
    t.merge(spark, spark.createDataFrame([(2, "b")], "k bigint, v string"))
    assert {r.k: r.v for r in t.read(spark).collect()} == {1: "a", 2: "b"}


def test_ann_index_via_facade(eng, tmp_path):
    path = eng.build_ann_index("pq", path=str(tmp_path / "pq"))
    import os

    assert os.path.exists(os.path.join(path, "_INDEX_META.json"))
    with pytest.raises(ValueError, match="unknown index kind"):
        eng.build_ann_index("hnsw")

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

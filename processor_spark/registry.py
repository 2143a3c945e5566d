"""Query registry — the single source of truth for SURVEY.md §2.

Every operator declared "done" registers here with BOTH its PySpark
builder and (when SQL-expressible) its DuckDB oracle SQL; the driver
contract (__spark_entry__.py) is a thin view over this registry.
Registering impl + oracle in one place keeps the column-name contract
(driver sorts columns by name before value-hashing) in one diff.

Conventions enforced by tests/test_oracle_parity.py:
- every float aggregate/computed value is rounded identically on both
  sides (sum-order across partitions differs between engines);
- every computed column is aliased to the same name on both sides;
- tie-prone LIMIT queries carry a deterministic tie-break key.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    key: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle SQL; None → driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Operator modules that self-register on import.
_MODULES = [
    "processor_spark.operators.scans",
    "processor_spark.operators.relational",
    "processor_spark.operators.joins",
    "processor_spark.operators.dss",
    "processor_spark.operators.aggregates",
    "processor_spark.operators.windows",
    "processor_spark.operators.setops",
    "processor_spark.operators.extended",
    "processor_spark.operators.temporal",
    "processor_spark.operators.timeseries",
    "processor_spark.operators.skew",
    "processor_spark.operators.corpus",
    "processor_spark.operators.cdc",
    "processor_spark.operators.dedup",
    "processor_spark.operators.graph",
    "processor_spark.operators.similarity",
    "processor_spark.operators.text",
    "processor_spark.operators.multimodal",
    "processor_spark.operators.layout",
    "processor_spark.operators.sketches",
    "processor_spark.operators.embedops",
    "processor_spark.operators.ranking",
    "processor_spark.operators.bpe",
    "processor_spark.operators.quality_model",
    "processor_spark.functions.families",
    "processor_spark.functions.udx",
]

_LOADED = False


def load_all_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _LOADED = True


def register(key: str, sql: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")

        # Bracket every top-level invocation so the previous key's
        # scoped persists are released deterministically (caching.py);
        # nested registered-fn calls are reentrancy-safe (depth guard).
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            from processor_spark import caching

            with caching.invocation(key):
                return fn(spark, sf_dir)

        _REGISTRY[key] = Query(key, wrapper, sql, doc or (fn.__doc__ or ""))
        return wrapper

    return deco


def get(key: str) -> Query:
    load_all_modules()
    return _REGISTRY[key]


def queries() -> dict[str, QueryFn]:
    load_all_modules()
    return {k: q.fn for k, q in sorted(_REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    load_all_modules()
    return {k: q.sql for k, q in sorted(_REGISTRY.items()) if q.sql is not None}

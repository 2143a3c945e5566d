"""processor_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of
``streamprocessor/processor`` (reference @ /root/reference, a 2-line
mission statement: "Apply complex transformations on single events or
collections" — README.md:2).  Per SURVEY.md §1, "events" map to
Structured Streaming DataFrames and "collections" to batch DataFrames;
one operator library serves both.

Layout
------
- ``session``    : SparkSession builder (AQE on, UTC, sane shuffle conf)
- ``sources``    : fixture loaders with pinned schemas + temp-view registration
- ``registry``   : query-key → (PySpark builder, DuckDB oracle SQL) registry
- ``operators``  : relational/temporal/LLM-pipeline operator builders (§2)
- ``functions``  : scalar function family wrappers (§2.8)
- ``streaming``  : readStream variants + stateful ops (§2.9)
- ``plans``      : plan-shape assertion helpers (§4 "free" claims)

Design rules (SURVEY.md §2.11, §4): DataFrame API only, built-in
functions over UDFs, broadcast hints for dims, zero custom Catalyst
rules — anything non-native is a logical rewrite in the builder layer.
"""

__version__ = "0.1.0"

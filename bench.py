#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on one warmed SparkSession, local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q_x": sec, ...}, "sf": 0.1}

Per BASELINE.md's engine-consistency note: each query is timed as a
full action on a warmed session, JVM startup excluded; a cold
per-query breakdown would measure driver overhead, not the plans.
The action is Arrow-batched ``toPandas()`` — the idiomatic PySpark
full-materialization path, and the engine-consistent twin of DuckDB's
columnar ``fetchdf``; row-pickling ``collect()`` was measured 5-6×
slower on 95 k-row outputs while executing the identical plan.

Isolation (round-3 hardening after the r2 driver run showed
warm ≈ cold interference on two keys that measure 2× faster when run
alone): the cache is cleared between keys so one key's persisted
subplans can't pressure the next, and the reported warm number is the
MEDIAN of three steady-state runs, so a single GC pause or scheduler
hiccup can't brand a plan as regressed.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# The 8 BASELINE.md headline queries.
HEADLINE = [
    "q_pricing_summary",
    "q_join_5way",
    "q_window_rank",
    "q_tumbling_window",
    "q_sessionization",
    "q_topk_similarity",
    "q_text_tokens",
    "q_grouping_sets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0  # unknown layout name; timings still valid

    from processor_spark import registry
    from processor_spark.session import build_session

    spark = build_session(app_name="processor_spark-bench")
    qs = registry.queries()

    # Warm the JVM/codegen once with the cheapest headline query so the
    # first measured query doesn't absorb one-time session costs.
    qs["q_topk_similarity"](spark, sf_dir).toPandas()

    keys = list(HEADLINE)
    if os.environ.get("SPARK_GRAFT_BENCH_ALL"):
        keys += sorted(k for k in qs if k not in HEADLINE)
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for key in keys:
        if key not in qs:
            continue
        # Isolate: drop any DataFrames the previous key persisted so its
        # cache blocks can't evict/compete with this key's working set.
        spark.catalog.clearCache()
        # run 1 (cold): includes plan + codegen compilation — a one-time
        # per-plan cost that amortizes to zero at 100 TB.  runs 2-4
        # (warm): steady-state execution; the MEDIAN is the reported
        # number (robust to one-off GC/scheduler noise).
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).toPandas()
        cold[key] = round(time.perf_counter() - t0, 4)
        warm = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).toPandas()
            warm.append(time.perf_counter() - t0)
        timings[key] = round(statistics.median(warm), 4)

    out = {
        "metric": "headline suite wall-clock (warm session, steady-state runs)",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "engine": "pyspark",
        "n_queries": len(timings),
        "cold_runs": cold,
        "cold_total": round(sum(cold.values()), 4),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

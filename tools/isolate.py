#!/usr/bin/env python3
"""Isolated 3-pass per-key measure — the canonical timing protocol
(CLAUDE.md: in-sweep rows are 2-5x upper bounds; only isolated
medians are comparable across rounds).  Fresh JVM, machine canary
stamped, one warm pass (plan+codegen), then three timed passes with
clearCache between; the MEDIAN is canonical.

Usage: python3 tools/isolate.py key1 [key2 ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Prints one JSON line.  NEVER run while another Spark job holds cores.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.canary import canary  # noqa: E402


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        sys.exit(__doc__)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from processor_spark import registry
    from processor_spark.session import build_session

    can = canary()
    spark = build_session(app_name="processor_spark-isolate")
    qs = registry.queries()
    out: dict = {
        "sf_dir": sf_dir,
        "canary": can,
        "loadavg": list(os.getloadavg()),
        "keys": {},
    }
    for key in keys:
        qs[key](spark, sf_dir).toPandas()  # warm
        passes = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).toPandas()
            passes.append(round(time.perf_counter() - t0, 3))
        out["keys"][key] = {
            "passes": passes,
            "median": round(statistics.median(passes), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

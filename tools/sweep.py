#!/usr/bin/env python3
"""Full-registry timing sweep: every registered key warm at
$SPARK_GRAFT_SF_DIR (default sf0.1), one session, bench.py-style
isolation (clearCache before the timed run; the timed run follows one
warm pass so plans/codegen/page cache are hot).

Prints one JSON line {"n": N, "total_sec": T, "queries": {key: sec}}
and, if $SPARK_GRAFT_SWEEP_OUT is set, writes it there too.  Use the
output as the per-key baseline artifact future rounds diff against
(BASELINE.md only ever recorded sweep totals before r6).

NEVER run while another Spark job holds the cores (CLAUDE.md / verify
skill: contention inflates times 2× with a warm≈cold signature).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from processor_spark import registry
    from processor_spark.session import build_session

    spark = build_session(app_name="processor_spark-sweep")
    qs = registry.queries()
    keys = sys.argv[1:] or sorted(qs)
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown query keys: {unknown}")

    times: dict[str, float] = {}
    for key in keys:
        qs[key](spark, sf_dir).toPandas()  # warm
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).toPandas()
        times[key] = round(time.perf_counter() - t0, 3)

    from tools.canary import canary

    out = {
        "n": len(times),
        "sf_dir": sf_dir,
        "total_sec": round(sum(times.values()), 2),
        # machine canary recorded IN the artifact so future diffs can
        # ambient-normalize (tools/sweep_confirm.py) — run after the
        # sweep so it doesn't warm anything the sweep sees
        "canary": canary(),
        "queries": times,
    }
    line = json.dumps(out)
    print(line)
    dest = os.environ.get("SPARK_GRAFT_SWEEP_OUT")
    if dest:
        with open(dest, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()

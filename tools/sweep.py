#!/usr/bin/env python3
"""Full-registry timing sweep: every registered key warm at
$SPARK_GRAFT_SF_DIR (default sf0.1), one session, bench.py-style
isolation (clearCache before the timed run; the timed run follows one
warm pass so plans/codegen/page cache are hot).

Prints one JSON line {"n": N, "total_sec": T, "queries": {key: sec}}
and, if $SPARK_GRAFT_SWEEP_OUT is set, writes it there too.  Use the
output as the per-key baseline artifact future rounds diff against
(BASELINE.md only ever recorded sweep totals before r6).

``--batch N`` (VERDICT r8 #5 / r10 #8): run the registry in
fresh-JVM batches of N keys, each in its own subprocess with a
pre-warm (two unmeasured passes of a cheap key absorb JIT/codegen
warm-up before the batch's first timed key).  One-JVM-345-key sweeps
accumulate 2-5x inflation with a front-of-alphabet warm-up signature
(the r8->r10 diff flagged 43 a-d keys, all dissolved isolated);
batching bounds both effects so in-sweep rows approach isolated
medians and sweep_confirm re-measures become rare.

NEVER run while another Spark job holds the cores (CLAUDE.md / verify
skill: contention inflates times 2× with a warm≈cold signature).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PREWARM_KEY = "q_project"  # cheap, dependency-light JIT absorber


def _run_batched(keys: list[str], batch: int, sf_dir: str) -> None:
    from tools.canary import canary

    merged: dict[str, float] = {}
    batch_canaries = []
    for i in range(0, len(keys), batch):
        chunk = keys[i : i + batch]
        env = dict(os.environ, SPARK_GRAFT_SWEEP_OUT="", SPARK_GRAFT_SWEEP_PREWARM="1")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *chunk],
            capture_output=True, text=True, env=env,
        )
        if r.returncode != 0:
            sys.exit(f"batch {i // batch} failed:\n{r.stderr[-2000:]}")
        data = json.loads(r.stdout.strip().splitlines()[-1])
        merged.update(data["queries"])
        batch_canaries.append(data["canary"])
    out = {
        "n": len(merged),
        "sf_dir": sf_dir,
        "total_sec": round(sum(merged.values()), 2),
        "canary": canary(),
        "batch": batch,
        "batch_canaries": batch_canaries,
        "queries": merged,
    }
    line = json.dumps(out)
    print(line)
    dest = os.environ.get("SPARK_GRAFT_SWEEP_OUT")
    if dest:
        with open(dest, "w") as fh:
            fh.write(line + "\n")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    args = list(sys.argv[1:])
    batch = 0
    if "--batch" in args:
        i = args.index("--batch")
        batch = int(args[i + 1])
        del args[i : i + 2]

    from processor_spark import registry
    from processor_spark.session import build_session

    if batch:
        qs = registry.queries()
        keys = args or sorted(qs)
        unknown = [k for k in keys if k not in qs]
        if unknown:
            sys.exit(f"unknown query keys: {unknown}")
        _run_batched(keys, batch, sf_dir)
        return

    spark = build_session(app_name="processor_spark-sweep")
    qs = registry.queries()
    keys = args or sorted(qs)
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown query keys: {unknown}")

    if os.environ.get("SPARK_GRAFT_SWEEP_PREWARM"):
        for _ in range(2):
            qs[_PREWARM_KEY](spark, sf_dir).toPandas()
        spark.catalog.clearCache()

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

#!/usr/bin/env python3
"""Shared-training consumers re-probed under the r14 EXACT-auto
assignment window (SCALE.md r14 refresh): the r13 rows for
q_prune_prototypes / q_semdedup_clusters were measured under routed
rp3 training and are upper bounds once auto went numpy-flat exact
(Sigma-occ2 36.4M flat vs 46.0M rp3 - the pair stage does ~21% less
work AND the assign stage drops the router).  Same protocol as the
r13 rows: the 64x jittered layout, fresh JVM, 2 passes with
clearCache between.  Requires /tmp/processor_spark-ann-bits-probe-64x
(run tools/ann_bits_probe.py first)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from processor_spark.session import build_session
from processor_spark import registry

registry.load_all_modules()
DST = "/tmp/processor_spark-ann-bits-probe-64x"
KEYS = ("q_semdedup_clusters", "q_prune_prototypes")
spark = build_session(app_name="consumers-exact-auto")
out = {}
for p in (1, 2):
    for key in KEYS:
        spark.catalog.clearCache()
        fn = registry.get(key).fn
        t0 = time.perf_counter()
        pdf = fn(spark, DST).toPandas()
        row = {"wall_s": round(time.perf_counter() - t0, 1), "rows": int(len(pdf))}
        out.setdefault(key, []).append(row)
        print(json.dumps({f"pass{p}": {key: row}}), flush=True)
print(json.dumps(out))

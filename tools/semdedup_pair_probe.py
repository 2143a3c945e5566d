#!/usr/bin/env python3
"""r15 (VERDICT r14 next #3): the within-cell all-pairs stage of the
SemDeDup family — the most expensive surviving path at 64x
(q_semdedup_clusters 33-55 s; the Catalyst pair join evaluates a
64-dim zip_with fold per candidate pair, ~36M pairs at Sigma-occ2
36.4M).  Candidate fix: a grouped numpy pair kernel (exact float64
decomposed distances — the module's sub-2^53 proof — plus norm-band
pruning, so pairs whose norm gap already exceeds sqrt(eps) never pay
a distance).

Measures, on the 64x jittered layout (run tools/ann_bits_probe.py
first), alternating legs x N passes with clearCache between:

  - q_semdedup end-to-end       (catalyst pair join vs numpy kernel)
  - q_semdedup_clusters e2e     (same two legs)

and, once, the kernel's pruning counters (pairs in band vs occ2) via
a direct kernel run.  Equality of the pair SET itself is pinned by
tests/test_semdedup_pair_kernel.py; this probe is the wall-clock
evidence.

Usage: python3 tools/semdedup_pair_probe.py [npasses]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from processor_spark.operators import similarity as S
from processor_spark.session import build_session
from tools.canary import canary

NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 2
DST = "/tmp/processor_spark-ann-bits-probe-64x"
spark = build_session(app_name="semdedup-pair-probe")

out = {"canary": canary(), "loadavg_1m": round(os.getloadavg()[0], 2)}


def run(leg: str, impl):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    if leg.endswith("clusters"):
        from processor_spark.operators.graph import connected_components

        assign = S._semdedup_assign_frame(spark, DST)
        pairs = S._semdedup_pairs(
            assign, S.SEMDEDUP_EPS, impl=impl
        ).localCheckpoint(eager=True)
        pdf = (
            connected_components(pairs)
            .select("doc_id", "cluster_id")
            .toPandas()
        )
    else:
        pdf = S.semdedup_verdicts(spark, DST, pair_impl=impl).toPandas()
    return round(time.perf_counter() - t0, 1), len(pdf)


for p in range(1, NP_ + 1):
    for leg in ("verdicts", "clusters"):
        for impl in ("catalyst", "numpy"):
            w, n = run(leg, impl)
            key = f"{leg}:{impl}"
            out.setdefault(key, []).append(w)
            print(json.dumps({f"pass{p}": {key: {"wall_s": w, "rows": n}}}), flush=True)

print(json.dumps(out))

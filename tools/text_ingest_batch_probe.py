#!/usr/bin/env python3
"""Single-partition hazard check for the streaming text-index ingest
(r14): a micro-batch reads ONE chunk file = one partition, so
_postings_frame's tokenize + posexplode (the compute-dense part; the
groupBy after it restores parallelism only past the shuffle) runs on
one core.  The IVF twin of this hazard measured ~90 s/batch; this
probe prices the TEXT side at a production-shaped batch (20k salted
docs in one file) — as-is vs pre-spread across cores — before any fix
ships (the q_ks_test precedent: spread on an agg-first key was pure
cost; tokenize-first may differ).

Usage: python3 tools/text_ingest_batch_probe.py [n_docs] [passes]
Prints JSON lines.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from processor_spark.operators.similarity import write_partitioned
    from processor_spark.operators.text import _postings_frame
    from processor_spark.session import build_session
    from processor_spark.sources.fixtures import load

    spark = build_session(app_name="text-ingest-batch-probe")
    work = tempfile.mkdtemp(prefix="text-ingest-probe-")

    base = load(spark, SRC, "documents").select("doc_id", "text")
    reps = N_DOCS // base.count() + 1
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(f" salt{i} "), F.col("text")),
        )
        for i in range(reps)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    chunk = os.path.join(work, "chunk.parquet")
    big.limit(N_DOCS).coalesce(1).write.parquet(chunk)

    legs = []
    for leg in ("asis", "spread") * PASSES:
        d = spark.read.parquet(chunk)
        if leg == "spread":
            d = d.repartition(32)
        t0 = time.perf_counter()
        postings, dl = _postings_frame(d)
        st = dl.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("tot"),
        ).collect()[0]
        out = os.path.join(work, f"gen-{len(legs)}")
        write_partitioned(postings, out, "tbucket")
        wall = round(time.perf_counter() - t0, 2)
        legs.append((leg, wall))
        print(json.dumps({"leg": leg, "wall_s": wall,
                          "n_docs": int(st.n_docs),
                          "tot_toks": int(st.tot)}), flush=True)
        shutil.rmtree(out, ignore_errors=True)
        spark.catalog.clearCache()
    med = {
        k: sorted(w for l, w in legs if l == k)[PASSES // 2]
        for k in ("asis", "spread")
    }
    print(json.dumps({"medians": med}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

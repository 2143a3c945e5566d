#!/usr/bin/env python3
"""Single-partition check for the streaming MinHash band projection
(r14): _minhash_bands_frame is a pure projection — array 3-grams + 2
seeded md5 digests per gram — that runs map-side of the band-state
groupBy, so a one-file micro-batch computes every digest on ONE core.
Prices a production-shaped 20k-doc batch as-is vs pre-spread, batch
mode, with the consumer's real action (toPandas of the band rows —
count() would prune the projection, the r12 rule).

Usage: python3 tools/minhash_stream_spread_probe.py [n_docs] [passes]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from processor_spark.session import build_session
    from processor_spark.sources.fixtures import load
    from processor_spark.streaming import pipelines as P

    spark = build_session(app_name="minhash-stream-spread-probe")
    work = tempfile.mkdtemp(prefix="minhash-spread-probe-")

    base = load(spark, SRC, "documents").select("doc_id", "text")
    reps = N_DOCS // base.count() + 1
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(f" salt{i} "), F.col("text"))
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
            d = d.repartition("doc_id")
        t0 = time.perf_counter()
        pdf = P._minhash_bands_frame(d).toPandas()
        wall = round(time.perf_counter() - t0, 2)
        legs.append((leg, wall))
        print(json.dumps({"leg": leg, "wall_s": wall, "rows": len(pdf)}),
              flush=True)
        spark.catalog.clearCache()
    med = {
        k: sorted(w for l, w in legs if l == k)[PASSES // 2]
        for k in ("asis", "spread")
    }
    print(json.dumps({"medians": med}))
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

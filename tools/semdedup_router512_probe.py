#!/usr/bin/env python3
"""Streaming-SemDeDup assignment at derived nlist=512 (VERDICT r12
"what's wrong": the literal-CASE router materializes every fine
centroid as column literals — ~34k ints at nlist=512/d=64 — and the
plan grows linearly with nlist while Catalyst re-plans it per
micro-batch; nothing measured it above the fixture floor).

This probe MEASURES both assignment impls at the hazard scale: the
64× jittered embeddings layout (128k vectors → derived nlist=512, the
same corpus ann_bits_probe uses), streamed in N chunks through
semdedup_stream_flags under each impl with a fresh checkpoint, plus
the one-shot batch assignment.  Records per impl:

- build_s: wall to CONSTRUCT the assignment frame (py4j literal cost)
- batch_s: one batch-mode assignment pass (toPandas)
- per-batch triggerExecution head/tail means from the progress feed

Usage: python3 tools/semdedup_router512_probe.py [n_chunks] [repl]
Prints one JSON line (the SCALE.md r13 row).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHUNKS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
REPL = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = f"/tmp/processor_spark-ann-bits-probe-{REPL}x"  # shared with ann_bits_probe


def build_layout(spark) -> None:
    # identical to tools/ann_bits_probe.py build_layout (shared DST —
    # whichever probe runs first builds it)
    from pyspark.sql import functions as F

    from processor_spark.sources.fixtures import load

    if os.path.isdir(DST):
        return
    os.makedirs(DST)
    df = load(spark, SRC, "embeddings")
    parts = []
    for i in range(REPL):
        rep = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        if i > 0:
            rep = rep.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, d) -> CAST(x + "
                    f"(((vec_id * 2654435761 + d * 40503 + {i}) % 997) / 997.0"
                    f" - 0.5) * 0.1 AS FLOAT))"
                ),
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")


def main() -> None:
    from pyspark.sql import types as T

    from processor_spark.session import build_session
    from processor_spark.sources import load
    from processor_spark.streaming import pipelines as P

    spark = build_session(app_name="processor_spark-router512-probe")
    build_layout(spark)
    work = tempfile.mkdtemp(prefix="router512-probe-")
    chunks = os.path.join(work, "inbox")
    os.makedirs(chunks)

    pdf = load(spark, DST, "embeddings").toPandas().sort_values("vec_id")
    n = len(pdf)
    step = (n + N_CHUNKS - 1) // N_CHUNKS
    for i in range(N_CHUNKS):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            os.path.join(chunks, f"chunk_{i:03d}.parquet"), index=False
        )
    del pdf

    # the real epoch path: flat-trained centroids at derived nlist
    root = os.path.join(work, "sem_root")
    t0 = time.time()
    P.retrain_semdedup_stream(spark, chunks, root)
    train_s = round(time.time() - t0, 1)
    meta = P._semdedup_epoch(root)
    cents = spark.read.parquet(os.path.join(root, "centroids"))
    cents_rows = [(r.cid, list(r.cm)) for r in cents.collect()]

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    static = spark.read.schema(schema).parquet(chunks)
    out = {
        "src": SRC,
        "repl": REPL,
        "n_vectors": int(n),
        "nlist": meta["nlist"],
        "n_chunks": N_CHUNKS,
        "train_s": train_s,
        "impls": {},
    }

    for impl in ("numpy", "literal"):
        row: dict = {}
        t0 = time.time()
        frame = P.semdedup_assign_frame(static, cents_rows, impl=impl)
        row["build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        got = frame.toPandas()
        row["batch_s"] = round(time.time() - t0, 2)
        row["batch_rows"] = int(len(got))
        row["n_cells_used"] = int(got["cell"].nunique())
        del got

        ckpt = os.path.join(work, f"ckpt-{impl}")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks)
        )
        sunk = []

        def sink(batch_df, batch_id):
            sunk.append((batch_id, batch_df.count()))

        t0 = time.time()
        q = (
            P.semdedup_stream_flags(stream, cents_rows, impl=impl)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(3600)
        if q.isActive:
            q.stop()
        row["stream_total_s"] = round(time.time() - t0, 1)
        prog = [json.loads(p.json) for p in q.recentProgress]
        batches = [
            {
                "batch_id": p["batchId"],
                "rows": p.get("numInputRows", 0),
                "trigger_ms": p["durationMs"].get("triggerExecution"),
            }
            for p in prog
            if p.get("numInputRows", 0) > 0
        ]
        head = [b["trigger_ms"] for b in batches[:4]]
        tail = [b["trigger_ms"] for b in batches[-4:]]
        row["n_batches"] = len(batches)
        row["head4_mean_ms"] = round(sum(head) / max(1, len(head)), 1)
        row["tail4_mean_ms"] = round(sum(tail) / max(1, len(tail)), 1)
        row["emitted_rows"] = int(sum(r for _, r in sunk))
        out["impls"][impl] = row

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

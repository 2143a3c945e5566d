#!/usr/bin/env python3
"""A/B of the streaming numpy assignment policy (flat vs routed) on IDENTICAL retrained centroids, fresh checkpoint per leg.  Leg 1 carries stream warmup - compare legs 2+ (SCALE.md r13)."""

import json, os, shutil, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import types as T
from processor_spark.session import build_session
from processor_spark.sources import load
from processor_spark.streaming import pipelines as P

spark = build_session(app_name="stream-policy-bench")
work = tempfile.mkdtemp(prefix="spb-")
chunks = os.path.join(work, "inbox"); os.makedirs(chunks)
pdf = load(spark, "/tmp/processor_spark-ann-bits-probe-64x", "embeddings").toPandas().sort_values("vec_id")
n = len(pdf); step = (n + 15) // 16
for i in range(16):
    pdf.iloc[i*step:(i+1)*step].to_parquet(os.path.join(chunks, f"c{i:03d}.parquet"), index=False)
del pdf
root = os.path.join(work, "root")
P.retrain_semdedup_stream(spark, chunks, root)
cents = spark.read.parquet(os.path.join(root, "centroids"))
rows = [(r.cid, list(r.cm)) for r in cents.collect()]
schema = T.StructType([T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType())])
out = {}
for tag, tl in (("flat", False), ("routed", True), ("flat2", False)):
    ckpt = os.path.join(work, f"ck-{tag}")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(chunks)
    sunk = []
    def sink(b, i): sunk.append(b.count())
    t0 = time.time()
    q = (P.semdedup_stream_flags(stream, rows, two_level=tl, impl="numpy")
         .writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination(3600)
    if q.isActive: q.stop()
    prog = [json.loads(p.json) for p in q.recentProgress if p.numInputRows > 0]
    ms = [p["durationMs"].get("triggerExecution") for p in prog]
    out[tag] = {"total_s": round(time.time()-t0,1), "head4": round(sum(ms[:4])/4,0), "tail4": round(sum(ms[-4:])/4,0), "rows": sum(sunk)}
    print(json.dumps({tag: out[tag]}), flush=True)
print(json.dumps(out))
shutil.rmtree(work, ignore_errors=True)

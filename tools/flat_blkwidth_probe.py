#!/usr/bin/env python3
"""Block-width sweep for the numpy flat assign at nlist=8192 (r14
close): the flat "cliff" flat_crossover_probe.py measured past
nlist=4096 was MEMORY TRAFFIC, not distance work - walls 42-48 s
single-block, 13.0-17.8 s at width 2048, 4.7-7.6 s at 1024, 6.5-7.7 s
at 512.  Basis for similarity.NUMPY_CENT_BLOCK = 1024.  Requires the
ann-bits 64x layout (tools/ann_bits_probe.py)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from processor_spark.session import build_session
from processor_spark.operators import similarity as S
from processor_spark.sources.fixtures import load
DST = "/tmp/processor_spark-ann-bits-probe-64x"
spark = build_session(app_name="blkwidth")
e = load(spark, DST, "embeddings", spread=True)
vecs = e.select("vec_id", S._micro_arr("embedding").alias("vm"))
rows = [(1 + i, [int(x) for x in r.vm]) for i, r in enumerate(vecs.orderBy("vec_id").limit(8192).collect())]
cents = spark.createDataFrame(rows, "cid long, cm array<bigint>")
_ = S._numpy_flat_assign(vecs, spark.createDataFrame(rows[:80], "cid long, cm array<bigint>")).select("vec_id","cell").toPandas()
out = {}
for rnd in (1, 2):
    for width in (512, 1024, 2048, 8192):
        S.NUMPY_CENT_BLOCK = width
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        S._numpy_flat_assign(vecs, cents).select("vec_id","cell").toPandas()
        w = round(time.perf_counter() - t0, 1)
        out.setdefault(width, []).append(w)
        print(json.dumps({"round": rnd, "width": width, "wall": w}), flush=True)
print(json.dumps(out))

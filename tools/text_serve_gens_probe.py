#!/usr/bin/env python3
"""r14-opt: price the streaming text-index SERVE fan-out across many
generations between compactions (OPTIMIZATION_r14.md "Not yet
optimized" #3 — the IVF twin has a 64× row, the text side had none).

Layout: the production-shaped 20k-salted-doc corpus of
tools/text_ingest_batch_probe.py, split into N_GENS chunk files;
stream_text_index_ingest (maxFilesPerTrigger=1) turns each chunk into
one posting generation (post-r14 clustered writes: one file per
term-bucket dir per generation).  Measured: serve_text_stream_bm25
wall (the consumer's real action, toPandas) at N_GENS generations vs
after compact_text_stream_index folds them to one, 3 alternating-free
passes each (clearCache between), plus per-layout leaf-file counts
and a result-equality assert (serving is layout-agnostic by
contract).

Usage: python3 tools/text_serve_gens_probe.py [n_docs] [n_gens]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
N_GENS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def leaf_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main() -> None:
    from pyspark.sql import functions as F

    from processor_spark.session import build_session
    from processor_spark.sources.fixtures import load
    from processor_spark.streaming.pipelines import (
        compact_text_stream_index,
        serve_text_stream_bm25,
        stream_text_index_ingest,
    )
    from tools.canary import canary

    spark = build_session(app_name="text-serve-gens-probe")
    work = tempfile.mkdtemp(prefix="text-serve-gens-")

    base = load(spark, SRC, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
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
    chunks = os.path.join(work, "chunks")
    big.limit(N_DOCS).repartition(N_GENS).write.parquet(chunks)

    idx = os.path.join(work, "index")
    ckpt = os.path.join(work, "ckpt")
    t0 = time.perf_counter()
    stream_text_index_ingest(spark, chunks, idx, ckpt, timeout_s=600)
    ingest_s = round(time.perf_counter() - t0, 2)
    root = os.path.join(idx, "postings")
    gens = sorted(g for g in os.listdir(root) if g.startswith("gen="))

    out = {
        "canary": canary(),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "n_docs": N_DOCS,
        "n_gens": len(gens),
        "ingest_s": ingest_s,
        "files_multi_gen": leaf_files(root),
    }

    def serve_passes(tag):
        walls = []
        res = None
        for _ in range(3):
            spark.catalog.clearCache()
            t = time.perf_counter()
            pdf = serve_text_stream_bm25(spark, idx).toPandas()
            walls.append(round(time.perf_counter() - t, 2))
            res = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        out[f"serve_{tag}_s"] = walls
        return res

    r_multi = serve_passes(f"gens{len(gens)}")
    t0 = time.perf_counter()
    compact_text_stream_index(spark, idx)
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    out["files_compacted"] = leaf_files(root)
    r_one = serve_passes("compacted")
    assert r_multi.equals(r_one), "serve results changed across compaction!"
    out["results_equal"] = True
    print(json.dumps(out), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Probe: does the NGRAM_DF_CAP stop-gram filter keep q_dedup_ngram's
candidate-pair count sub-quadratic as the corpus grows?

The hazard (VERDICT r2 §wrong-3): the inverted-index self-join emits
C(df, 2) pairs per (source, gram), so one ubiquitous gram — legal
boilerplate, a licence header — makes candidate volume quadratic in
corpus size.  This probe manufactures that worst case deliberately:

1. appends a fixed boilerplate sentence to 30% of documents (creating
   grams with df ≈ 0.3 · n_docs — true stop-grams), then
2. replicates the corpus 1× / 2× / 4× / 8× (doc_id-shifted), and
3. computes the candidate-pair count Σ C(df,2) with and without the
   df cap — directly from the gram-df distribution, which is exact and
   far cheaper than materializing the pairs.

Expected: uncapped pairs grow ~N² (the boilerplate term dominates —
measured 66× at 8×).  Capped pairs track the corpus's TRUE duplication
(replicating 8× manufactures C(8,2)=28 real dup pairs per base doc, so
raw capped growth is not the headline number); the guarantees to read
off are (a) the noise ratio — uncapped emits 20-50× more candidate
pairs, every excess pair a stop-gram artifact the verify stage would
discard — and (b) the invariant that no posting list can emit more
than C(cap,2)=2016 pairs regardless of corpus size, which makes total
candidate volume O(#distinct grams), i.e. linear in the corpus.
Wall-clock of the full q_dedup_ngram plan is also reported at 1× / 8×.

Usage: python3 tools/ngram_cap_probe.py   → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/processor_spark-ngram-cap-probe"
BOILERPLATE = (
    " this document is provided as is without warranty of any kind "
    "express or implied including fitness for a particular purpose"
)
REPLICAS = [1, 2, 4, 8]


def build_layouts(spark) -> None:
    from pyspark.sql import functions as F

    from processor_spark.sources import load

    base = load(spark, SRC, "documents").withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3, F.concat(F.col("text"), F.lit(BOILERPLATE)))
        .otherwise(F.col("text")),
    )
    for n in REPLICAS:
        out = base
        for i in range(1, n):
            out = out.unionByName(
                base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
            )
        out.write.mode("overwrite").parquet(f"{DST}/{n}x/documents.parquet")


def pair_counts(spark, sf_dir: str, cap: int | None) -> int:
    """Σ over (source, gram) of C(df, 2) — the exact number of raw
    candidate pairs the inverted-index join would emit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from processor_spark.operators.dedup import _tokens
    from processor_spark.sources import load

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            "source",
            F.concat_ws(" ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)).alias("gram"),
            F.lead("tok", 2).over(w).alias("_has3"),
        )
        .where(F.col("_has3").isNotNull())
        .select("doc_id", "source", "gram")
        .distinct()
    )
    df = grams.groupBy("source", "gram").agg(F.count(F.lit(1)).alias("df"))
    if cap is not None:
        df = df.where(F.col("df") <= cap)
    row = df.agg(F.sum(F.expr("df * (df - 1) / 2")).alias("pairs")).collect()[0]
    return int(row["pairs"] or 0)


def main() -> None:
    from processor_spark import registry
    from processor_spark.operators.dedup import NGRAM_DF_CAP
    from processor_spark.session import build_session

    spark = build_session(app_name="processor_spark-ngram-cap-probe")
    build_layouts(spark)

    out: dict[str, dict[str, int]] = {}
    for n in REPLICAS:
        sf_dir = f"{DST}/{n}x"
        out[f"{n}x"] = {
            "uncapped_pairs": pair_counts(spark, sf_dir, None),
            "capped_pairs": pair_counts(spark, sf_dir, NGRAM_DF_CAP),
        }

    wall: dict[str, float] = {}
    q = registry.queries()["q_dedup_ngram"]
    for n in (1, REPLICAS[-1]):
        sf_dir = f"{DST}/{n}x"
        q(spark, sf_dir).toPandas()  # warm
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q(spark, sf_dir).toPandas()
        wall[f"{n}x"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()

    hi, lo = f"{REPLICAS[-1]}x", "1x"
    print(json.dumps({
        "cap": NGRAM_DF_CAP,
        "max_pairs_per_posting_list": NGRAM_DF_CAP * (NGRAM_DF_CAP - 1) // 2,
        "pair_counts": out,
        "uncapped_growth_at_8x": round(out[hi]["uncapped_pairs"] / max(out[lo]["uncapped_pairs"], 1), 1),
        "noise_ratio": {
            k: round(v["uncapped_pairs"] / max(v["capped_pairs"], 1), 1)
            for k, v in out.items()
        },
        "q_dedup_ngram_wall_sec": wall,
    }))


if __name__ == "__main__":
    main()

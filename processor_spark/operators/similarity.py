"""Embedding similarity search (SURVEY.md §2.10; EDBT'19/'20, ICDE'21 patterns).

Three tiers, matching published distributed top-k search designs:
1. q_topk_similarity — brute-force top-k vs one query vector (baseline)
2. q_knn_join        — k-NN join: small query set × corpus, window top-k
3. q_ann_lsh         — sign-random-projection LSH buckets, search within
                       bucket only (the 100 TB path: candidate set per
                       query is O(bucket), not O(corpus))
4. q_dedup_embed     — embedding-cosine near-dup pairs (label-blocked)

All dot products / norms are pure built-ins (zip_with + aggregate →
JVM codegen, no Python boundary).  Floats are cast to double before
arithmetic so Spark and DuckDB agree bit-for-bit after rounding
(SURVEY.md §7 watch list).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from processor_spark.caching import scoped_persist
from processor_spark.registry import register
from processor_spark.sources import load

QUERY_VEC_ID = 1
TOP_K = 10
KNN_QUERIES = 20  # vec_id 1..20 act as the query set
KNN_K = 5
LSH_BITS = 4  # sign bits per hash table → 16 buckets/table
LSH_TABLES = 4  # OR-amplification: candidate if colliding in ANY table


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns — built-ins only."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


@register(
    "q_topk_similarity",
    sql=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 6) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def q_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-10 cosine neighbors of one query vector.

    The 1-row query side is crossJoin-broadcast; orderBy().limit()
    becomes TakeOrderedAndProject, so at 100 TB this is one scan with a
    per-partition heap — the canonical brute-force ANN baseline.
    """
    e = load(spark, sf_dir, "embeddings")
    q = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding").alias("qvec"))
    )
    return (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(_as_double("embedding"), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "q_knn_join",
    sql=f"""
    SELECT q_id, vec_id AS neighbor_id, cos_sim, rn AS rank
    FROM (
      SELECT q.vec_id AS q_id, e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                     CAST(q.embedding AS DOUBLE[])), 6) DESC,
                        e.vec_id
             ) AS rn
      FROM embeddings q
      JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id <= {KNN_QUERIES}
    )
    WHERE rn <= {KNN_K}
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: 5 nearest corpus vectors for each of 20 query vectors.

    Query side is broadcast (small by construction); similarity is
    computed corpus-side in one pass and per-query top-k falls out of a
    row_number window partitioned by query id.  For corpus×corpus k-NN
    at 100 TB, swap the broadcast for the LSH bucketing of q_ann_lsh
    (REPOSE/ICDE'21-style partition-local search).
    """
    e = load(spark, sf_dir, "embeddings", spread=True)
    # per-vector norms hoisted out of the pair stage (see q_dedup_embed)
    corpus = e.select("vec_id", _as_double("embedding").alias("emb")).withColumn(
        "nrm", l2norm(F.col("emb"))
    )
    q = corpus.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    sim = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


def _table_bucket_expr(emb_col: str, table: int, bits: int | None = None) -> Column:
    """Sign-LSH bucket for one hash table: ``bits`` sign bits taken from
    that table's own dimension slice (default LSH_BITS).  Fixed
    coordinate signs (not random Gaussian planes) keep the function
    reproducible across engines and rounds; swap in seeded hyperplanes
    for production.  ``bits`` is the deployment's scale knob — real
    clusters set bits ≈ log2(n / target_bucket) as the corpus grows
    (measured: tools/ann_bits_probe.py, SCALE.md r8)."""
    bits = LSH_BITS if bits is None else bits
    base = table * bits
    bit_terms = [
        F.when(F.element_at(F.col(emb_col), base + i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def _sql_bucket(table: int) -> str:
    base = table * LSH_BITS
    return " + ".join(
        f"(CASE WHEN embedding[{base + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(LSH_BITS)
    )


_ANN_SQL = f"""
    WITH b AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             {", ".join(f"{_sql_bucket(t)} AS bucket{t}" for t in range(LSH_TABLES))}
      FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, emb AS qvec,
             {", ".join(f"bucket{t} AS qbucket{t}" for t in range(LSH_TABLES))}
      FROM b WHERE vec_id <= {KNN_QUERIES}
    ), cands AS (
      {" UNION ".join(
        f"SELECT q.q_id, b.vec_id, b.emb, q.qvec FROM b JOIN q ON b.bucket{t} = q.qbucket{t} AND b.vec_id <> q.q_id"
        for t in range(LSH_TABLES)
      )}
    )
    SELECT q_id, vec_id AS neighbor_id,
           round(cos_raw, 6) AS cos_sim, rn AS rank
    FROM (
      SELECT q_id, vec_id,
             list_cosine_similarity(emb, qvec) AS cos_raw,
             row_number() OVER (
               PARTITION BY q_id
               ORDER BY round(list_cosine_similarity(emb, qvec), 6) DESC, vec_id
             ) AS rn
      FROM cands
    ) t
    WHERE rn <= {KNN_K}
    """


@register("q_ann_lsh", sql=_ANN_SQL)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN via multi-table sign-projection LSH.

    OR-amplification across LSH_TABLES hash tables (each LSH_BITS sign
    bits over its own dimension slice): a pair is a candidate if it
    collides in ANY table — single-table sign LSH was measured at ~3%
    recall@5 on these near-orthogonal synthetic embeddings (p^bits with
    p≈0.6 per plane); 4 tables × 4 bits lifts measured recall to ~40%
    while scanning ~L/2^bits ≈ 25% of the corpus per query.  On real
    clustered embeddings (neighbor cos ≈ 0.8 ⇒ p ≈ 0.8) the same
    structure gives ~90% recall at the same cost — the standard LSH
    recall/cost trade, tuned per corpus.  Candidate generation stays a
    plain equi-join per table (union + distinct), never all-pairs.
    Deterministic bucket fn ⇒ SQL-oracle-checkable despite being approximate.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    ).withColumn("nrm", l2norm(F.col("emb")))
    for t in range(LSH_TABLES):
        e = e.withColumn(f"bucket{t}", _table_bucket_expr("emb", t))
    q = e.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qvec"),
        F.col("nrm").alias("qnrm"),
        *[F.col(f"bucket{t}").alias(f"qbucket{t}") for t in range(LSH_TABLES)],
    )
    # "collides in ANY table" as ONE OR-predicate broadcast join (r15):
    # the old shape ran LSH_TABLES separate broadcast joins (each a
    # full corpus scan) + union — the OR over the tiny broadcast query
    # side is a single nested-loop pass over ONE scan, same candidate
    # SET (dropDuplicates keeps one row per (q_id, vec_id); the carried
    # columns are identical across tables).  SCALE.md r15: the
    # identical rewrite on q_ann_graph's seed stage measured
    # 1.54 → 0.61 s isolated at sf0.1.
    any_tbl = None
    for t in range(LSH_TABLES):
        c = e[f"bucket{t}"] == q[f"qbucket{t}"]
        any_tbl = c if any_tbl is None else (any_tbl | c)
    cands = (
        e.join(F.broadcast(q), on=any_tbl)
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "emb", "nrm", "qvec", "qnrm")
        .dropDuplicates(["q_id", "vec_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cands.select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


IVF_DIM = 64
IVF_NPROBE = 2


_IVF_SQL = f"""
    WITH cents AS (
      SELECT label AS cid, list(round(v, 6) ORDER BY dim) AS cvec FROM (
        SELECT label, gs.dim AS dim, avg(CAST(embedding[gs.dim] AS DOUBLE)) AS v
        FROM embeddings, generate_series(1, {IVF_DIM}) AS gs(dim)
        GROUP BY label, gs.dim
      ) GROUP BY label
    ), assign AS (
      SELECT vec_id, emb, cid AS cell FROM (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                          c.cid) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ), probes AS (
      SELECT q_id, cid AS cell FROM (
        SELECT e.vec_id AS q_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                          c.cid) AS rn
        FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <= {KNN_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}
    ), qv AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qvec
      FROM embeddings WHERE vec_id <= {KNN_QUERIES}
    )
    SELECT q_id, vec_id AS neighbor_id, round(cos_raw, 6) AS cos_sim, rn AS rank FROM (
      SELECT p.q_id, a.vec_id,
             list_cosine_similarity(a.emb, qv.qvec) AS cos_raw,
             row_number() OVER (PARTITION BY p.q_id
               ORDER BY round(list_cosine_similarity(a.emb, qv.qvec), 6) DESC, a.vec_id) AS rn
      FROM probes p JOIN assign a ON a.cell = p.cell JOIN qv ON qv.q_id = p.q_id
      WHERE a.vec_id <> p.q_id
    ) WHERE rn <= {KNN_K}
    """


@register("q_ann_ivf", sql=_IVF_SQL)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: Voronoi-cell index + nprobe search.

    The third scale path alongside sign-LSH (q_ann_lsh) and ml LSH
    (q_ann_ml): corpus vectors are assigned to their nearest centroid
    cell once (an O(n·nlist) map-side pass — centroids broadcast,
    argmax via max_by partial aggregation so only one row per vector
    crosses the shuffle), and each query probes only its IVF_NPROBE
    nearest cells, scanning ~nprobe/nlist of the corpus.  Centroids
    here are per-label mean vectors — deterministic (vs k-means'
    init-dependence), so the whole index is SQL-oracle-checkable;
    production swaps in k-means centroids, same plan shape.  Components
    are rounded to 6dp on both engines before any cosine so the two
    sides index identically."""
    e = load(spark, sf_dir, "embeddings")
    # deterministic centroids: per-label per-dimension mean, 6dp-rounded
    cents = (
        e.select("label", F.posexplode(_as_double("embedding")).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("v"))
        .groupBy(F.col("label").alias("cid"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda s: F.round(s["v"], 6),
            ).alias("cvec")
        )
    )
    corpus = e.select("vec_id", _as_double("embedding").alias("emb")).withColumn(
        "nrm", l2norm(F.col("emb"))
    )
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "emb",
        "nrm",
        "cid",
        (dot(F.col("emb"), F.col("cvec")) / (F.col("nrm") * l2norm(F.col("cvec")))).alias(
            "ccos"
        ),
    )
    # nearest cell per vector: map-side max_by, ties to the lowest cid
    assign = scored.groupBy("vec_id").agg(
        F.max_by("cid", F.struct(F.col("ccos"), -F.col("cid"))).alias("cell"),
        F.first("emb").alias("emb"),
        F.first("nrm").alias("nrm"),
    )
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        scored.where(F.col("vec_id") <= KNN_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "cid", "ccos")
        .withColumn("rn", F.row_number().over(probe_w))
        .where(F.col("rn") <= IVF_NPROBE)
        .select("q_id", F.col("cid").alias("cell"))
    )
    qv = corpus.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    cands = (
        assign.join(F.broadcast(probes), on="cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(qv), on="q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cands.select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


# ------------------------------------------------------- persist-and-serve

ANN_INDEX_ROOT = "/tmp/processor_spark_ann"

# Persisted-index format version: indexes live under /tmp and survive
# across sessions AND code revisions — a format change (new layout,
# different hash family, changed parameters) must force a rebuild, not
# serve stale bytes.  Bump when any build_*_index output changes shape.
# fmt 2 (r9): ivf_kmeans assignments carry the label column for
# filtered serving.
# fmt 3 (r11): ivf_kmeans assignments are partitioned by (cell, label)
# — label-sharded cells, so a selective metadata predicate prunes
# DIRECTORIES instead of filtering rows inside probed cells.
# fmt 4 (r13): ivf_kmeans cells are PAIR-GRADE — train and assign
# route multi-probe (rprobe=TWOLEVEL_RPROBE_PAIR) past the two-level
# threshold, so index-backed occupancy² consumers (q_semdedup_serve,
# q_semdedup_clusters_serve) inherit near-flat cell balance instead of
# the rprobe=1 routed imbalance (VERDICT r12 missing #3).  Fixture
# scale builds flat either way (identical bytes); the fmt bump forces
# scale-probe layouts under /tmp to rebuild.
ANN_INDEX_FMT = 4


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """Cluster rows by the partition columns BEFORE a partitionBy
    write.  Without it every write task emits a file into every
    directory it holds rows for — measured at 64×/nlist=512 (fmt-4
    (cell,label) layout): 56,161 files for 128,000 rows (~2.3
    rows/file), and the full-index consumers went file-open-bound
    (q_semdedup_serve 65.2 s for a 15 s pair stage — SCALE.md r13).
    One repartition makes each directory exactly one task's output →
    one file per directory; at 100 TB file count stays dir-count ×
    O(1) instead of dir-count × cluster-width."""
    df.repartition(*[F.col(c) for c in cols]).write.partitionBy(*cols).parquet(
        path
    )


def _index_is_current(meta_path: str, kind: str | None = None) -> bool:
    """fmt (and, when given, KIND) gate on a persisted-index marker —
    a different builder's marker at the same explicit path= must not
    be trusted as current (same rule text.py's incremental marker
    follows; ADVICE r9)."""
    import json
    import os

    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as fh:
            m = json.load(fh)
        return m.get("fmt") == ANN_INDEX_FMT and (
            kind is None or m.get("kind") == kind
        )
    except (OSError, ValueError):
        return False



def build_ivf_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Build the IVF index ONCE and persist it (VERDICT r5 next #2):
    centroids + cell assignments written as parquet, assignments
    partitioned BY CELL so a serving query's nprobe cells map to
    directory-pruned scans.  Idempotent: an existing index (atomic
    _INDEX_META marker) is reused — the whole point vs q_ann_ivf,
    which re-derives centroids and re-assigns the corpus every call.

    At 100 TB this split is the difference between an offline index
    build (one corpus-sized job, amortized over every query) and
    paying that job per query batch; serving reads only
    ~nprobe/nlist of the assignment files thanks to the cell
    partitioning."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "ivf")
    meta = os.path.join(path, "_INDEX_META.json")
    if _index_is_current(meta, kind="ivf") and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    e = load(spark, sf_dir, "embeddings")
    # identical index derivation to q_ann_ivf (shared oracle contract):
    # deterministic per-label mean centroids, 6dp-rounded components
    cents = (
        e.select("label", F.posexplode(_as_double("embedding")).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("v"))
        .groupBy(F.col("label").alias("cid"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda s: F.round(s["v"], 6),
            ).alias("cvec")
        )
    )
    corpus = e.select("vec_id", _as_double("embedding").alias("emb")).withColumn(
        "nrm", l2norm(F.col("emb"))
    )
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "emb",
        "nrm",
        "cid",
        (dot(F.col("emb"), F.col("cvec")) / (F.col("nrm") * l2norm(F.col("cvec")))).alias(
            "ccos"
        ),
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by("cid", F.struct(F.col("ccos"), -F.col("cid"))).alias("cell"),
        F.first("emb").alias("emb"),
        F.first("nrm").alias("nrm"),
    )
    cents.write.parquet(os.path.join(path, "centroids"))
    write_partitioned(assign, os.path.join(path, "assignments"), "cell")
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"kind": "ivf", "fmt": ANN_INDEX_FMT, "nprobe": IVF_NPROBE,
             "source": sf_dir},
            fh,
        )
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_ann_ivf_serve", sql=_IVF_SQL)
def q_ann_ivf_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN *serving* path: load the persisted index
    (build_ivf_index — built once, reused across invocations) instead
    of rebuilding centroids and re-assigning the corpus per query.
    Query-time work is only: score queries against the broadcast
    centroid table (|Q| × nlist, trivial), read the nprobe probed
    cells' assignment partitions (directory-pruned — the static
    IN-filter on the partition column skips every other cell's files
    at planning time), and rank candidates.  Same oracle as q_ann_ivf:
    the persisted index is exactly the rebuilt one, so results are
    bit-identical — the hash check certifies the index round trip
    through parquet."""
    import os

    path = build_ivf_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    qv = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") <= KNN_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"), _as_double("embedding").alias("qvec")
        )
        .withColumn("qnrm", l2norm(F.col("qvec")))
    )
    qscored = qv.crossJoin(F.broadcast(cents)).select(
        "q_id",
        "qvec",
        "qnrm",
        "cid",
        (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * l2norm(F.col("cvec")))).alias(
            "ccos"
        ),
    )
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(probe_w))
        .where(F.col("rn") <= IVF_NPROBE)
        .select("q_id", F.col("cid").alias("cell"))
    )
    # probed cells are bounded by nlist — collecting them is a
    # scalar-sized action that buys static partition pruning on the
    # assignments scan (only those cells' directories are opened)
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    assign = spark.read.parquet(os.path.join(path, "assignments")).where(
        F.col("cell").isin(cells)
    )
    cands = (
        assign.join(F.broadcast(probes), on="cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .join(
            F.broadcast(qv.select("q_id", "qvec", "qnrm")), on="q_id"
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cands.select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


@register(
    "q_dedup_embed",
    sql="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.99
    """,
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.99), blocked by label.

    Label acts as the blocking key (in production: an LSH bucket or
    cluster id) so the pair space is per-block, not global — the
    standard semantic-dedup shape for LLM corpora.

    spread=True: the pair-scoring stage is compute-dense (a 64-dim dot
    per candidate pair) and the build side broadcasts, so the probe
    side's partitioning alone decides the parallelism — a single-file
    scan would run every pair on one core. At cluster scale the same
    balance comes from partitioning both sides by (block, salt).
    """
    e = load(spark, sf_dir, "embeddings", spread=True)
    # hoist the L2 norm to a per-vector column: the pair stage then does
    # one dot product per pair instead of dot + two array folds —
    # bit-identical result (same expression tree, evaluated once)
    base = e.select(
        "vec_id", "label", _as_double("embedding").alias("emb")
    ).withColumn("nrm", l2norm(F.col("emb")))
    a = base.select(
        F.col("vec_id").alias("vec_a"), "label",
        F.col("emb").alias("emb_a"), F.col("nrm").alias("nrm_a"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"),
        F.col("emb").alias("emb_b"), F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(
        b, (a.label == b.label_b) & (F.col("vec_a") < F.col("vec_b"))
    ).withColumn(
        "cos_sim_raw",
        dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b")),
    )
    return pairs.where(F.col("cos_sim_raw") >= 0.99).select(
        "vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim")
    )


@register("q_ann_ml", sql=None)  # seeded ml LSH → rows-only
def q_ann_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via pyspark.ml BucketedRandomProjectionLSH (SURVEY.md §2.10 [P]).

    The MLlib twin of q_ann_lsh: seeded random hyperplane projections
    with multi-table OR-amplification, then approxSimilarityJoin
    pruning candidate pairs by Euclidean distance (on unit-normalized
    vectors, d² = 2 - 2·cos; the 1.35 radius ≈ cos ≥ 0.09, tuned to
    the near-orthogonal synthetic embeddings which top out ~cos 0.37).
    Complements the hand-rolled sign-projection variant: ml handles
    the hash family, the engine supplies normalize + join + top-k.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings", spread=True)
    norm = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: x / F.sqrt(F.aggregate(
            F.transform(F.col("embedding").cast("array<double>"), lambda y: y * y),
            F.lit(0.0), lambda a, y: a + y)),
    )
    vecs = e.select("vec_id", array_to_vector(norm).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    )
    model = lsh.fit(vecs)
    q = vecs.where(F.col("vec_id") <= KNN_QUERIES)
    pairs = model.approxSimilarityJoin(q, vecs, 1.35, distCol="dist")
    out = pairs.select(
        F.col("datasetA.vec_id").alias("q_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        F.round("dist", 6).alias("dist"),
    ).where(F.col("q_id") != F.col("neighbor_id"))
    w = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return out.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= KNN_K)


@register(
    "q_embed_stats",
    sql="""
    WITH comp AS (
      SELECT label, p.pos, embedding[p.pos] AS val
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
    ), per_dim AS (
      SELECT label, pos,
             round(avg(val), 6) AS cent,
             round(avg(val * val), 6) AS msq,
             count(*) AS n
      FROM comp GROUP BY label, pos
    )
    SELECT label,
           max(n) AS n_vecs,
           round(sqrt(sum(cent * cent)), 4) AS centroid_norm,
           round(avg(msq - cent * cent), 6) AS dispersion
    FROM per_dim
    GROUP BY label
    """,
)
def q_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cluster statistics per label: centroid L2 norm and
    mean per-dimension variance (dispersion) — the diversity /
    collapse diagnostics a training-data pipeline runs before
    sampling.  Vectors are unpivoted with posexplode and reduced in
    two hash aggs keyed (label, dim) then (label): fully mergeable,
    no pairwise work, so cost is rows x dims regardless of cluster
    count — the scale-safe alternative to pairwise diversity metrics.
    Per-dim means are rounded before the second pass so both engines
    fold identical doubles."""
    em = load(spark, sf_dir, "embeddings")
    comp = em.select("label", F.posexplode("embedding").alias("pos0", "val"))
    per_dim = comp.groupBy("label", (F.col("pos0") + 1).alias("pos")).agg(
        F.round(F.avg("val"), 6).alias("cent"),
        F.round(F.avg(F.col("val") * F.col("val")), 6).alias("msq"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_dim.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.round(F.sqrt(F.sum(F.col("cent") * F.col("cent"))), 4).alias("centroid_norm"),
        F.round(F.avg(F.col("msq") - F.col("cent") * F.col("cent")), 6).alias("dispersion"),
    )


@register(
    "q_knn_classify",
    sql=f"""
    WITH nn AS (
      SELECT q_id, vec_id, rn
      FROM (
        SELECT q.vec_id AS q_id, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                       CAST(q.embedding AS DOUBLE[])), 6) DESC,
                          e.vec_id
               ) AS rn
        FROM embeddings q
        JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id <= {KNN_QUERIES}
      ) WHERE rn <= {KNN_K}
    ), votes AS (
      SELECT nn.q_id, l.label, count(*) AS votes,
             row_number() OVER (PARTITION BY nn.q_id
                                ORDER BY count(*) DESC, l.label) AS vr
      FROM nn JOIN embeddings l ON l.vec_id = nn.vec_id
      GROUP BY nn.q_id, l.label
    )
    SELECT v.q_id, t.label AS true_label, v.label AS pred_label,
           CAST(v.votes AS BIGINT) AS votes,
           CASE WHEN v.label = t.label THEN 1 ELSE 0 END AS correct
    FROM votes v
    JOIN embeddings t ON t.vec_id = v.q_id
    WHERE v.vr = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification: each held-out query vector is
    labeled by its 5 nearest corpus neighbors (deterministic tie-break:
    most votes, then smallest label) — the standard embedding-quality
    eval a training-data pipeline runs after building an index.  Built
    on the same broadcast + window top-k as q_knn_join; the vote is a
    tiny agg over q x k rows, and the label lookups broadcast."""
    nn = q_knn_join(spark, sf_dir).select("q_id", "neighbor_id")
    em = load(spark, sf_dir, "embeddings")
    labels = em.select("vec_id", "label")
    votes = (
        nn.join(F.broadcast(labels), nn.neighbor_id == labels.vec_id)
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("label"))
    pred = votes.withColumn("vr", F.row_number().over(w)).where(F.col("vr") == 1)
    truth = labels.select(F.col("vec_id").alias("q_id"), F.col("label").alias("true_label"))
    return (
        pred.join(F.broadcast(truth), "q_id")
        .select(
            "q_id",
            "true_label",
            F.col("label").alias("pred_label"),
            "votes",
            F.when(F.col("label") == F.col("true_label"), 1).otherwise(0).alias("correct"),
        )
    )


_KMEANS_K = 4  # centroids seeded from vec_id 0..3 (deterministic, no RNG)

_KMEANS_SQL = f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < {_KMEANS_K}
    ), vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ), dists AS (
      SELECT v.vec_id, c.cent_id,
             sqrt(list_sum(list_transform(range(1, len(v.vec) + 1),
                  i -> (v.vec[i] - c.cvec[i]) * (v.vec[i] - c.cvec[i])))) AS dist
      FROM vecs v CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, cent_id, dist
      FROM dists
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cent_id) = 1
    )
    SELECT cent_id, count(*) AS n_assigned,
           round(min(dist), 6) AS min_dist,
           round(max(dist), 6) AS max_dist
    FROM assigned GROUP BY cent_id
"""


@register("q_kmeans_assign", sql=_KMEANS_SQL)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means ASSIGNMENT step with deterministic seeds (centroids =
    vectors 0..{_KMEANS_K-1}; no RNG, so the oracle can replay it):
    every vector goes to its nearest centroid by L2, ties to the lower
    centroid id.

    Scale shape: centroids broadcast (k vectors, always tiny); the
    distance computation is a narrow map over the corpus — one pass,
    no shuffle until the per-centroid agg.  A full Lloyd iteration =
    this + centroid re-averaging (same broadcast-agg pattern looped
    with localCheckpoint, as in q_pagerank); per-cluster counts and
    distance extrema are exact/minmax values, so no float-sum parity
    hazard.
    """
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", _as_double("embedding").alias("vec"))
    cents = (
        e.where(F.col("vec_id") < _KMEANS_K)
        .select(F.col("vec_id").alias("cent_id"), _as_double("embedding").alias("cvec"))
    )
    sqdist = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cent_id", F.sqrt(sqdist).alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cent_id")
    assigned = dists.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return assigned.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.round(F.min("dist"), 6).alias("min_dist"),
        F.round(F.max("dist"), 6).alias("max_dist"),
    )


# q_kmeans_update: elements are shifted by +2 before integerizing so
# every micro value is positive — Spark `div` truncates toward zero
# while DuckDB `//` floors, and the two only agree on non-negative
# operands.  The shift cancels in the |new - old| drift terms.
_KMEANS_UPDATE_SQL = f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < {_KMEANS_K}
    ), vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ), dists AS (
      SELECT v.vec_id, c.cent_id,
             list_reduce(list_transform(range(1, len(v.vec) + 1),
                  i -> (v.vec[i] - c.cvec[i]) * (v.vec[i] - c.cvec[i])),
               (a, x) -> a + x) AS sqdist
      FROM vecs v CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, cent_id FROM dists
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sqdist, cent_id) = 1
    ), elems AS (
      SELECT a.cent_id,
             unnest(range(1, len(v.vec) + 1)) AS pos,
             unnest(list_transform(v.vec,
                    x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT))) AS micro
      FROM assigned a JOIN vecs v USING (vec_id)
    ), means AS (
      SELECT cent_id, pos, CAST(sum(micro) AS BIGINT) // count(*) AS new_micro
      FROM elems GROUP BY cent_id, pos
    ), old AS (
      SELECT cent_id, unnest(range(1, len(cvec) + 1)) AS pos,
             unnest(list_transform(cvec,
                    x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT))) AS old_micro
      FROM cents
    ), sizes AS (
      SELECT cent_id, count(*) AS n_assigned FROM assigned GROUP BY cent_id
    )
    SELECT m.cent_id, CAST(s.n_assigned AS BIGINT) AS n_assigned,
           CAST(sum(abs(m.new_micro - o.old_micro)) AS BIGINT) AS drift_micro
    FROM means m
    JOIN old o USING (cent_id, pos)
    JOIN sizes s USING (cent_id)
    GROUP BY m.cent_id, s.n_assigned
"""


@register("q_kmeans_update", sql=_KMEANS_UPDATE_SQL)
def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL Lloyd iteration — assignment plus centroid re-averaging
    — with the new centroids compared against the old ones (per-cluster
    L1 drift), i.e. the convergence measure an iterative training loop
    would test each round.  Everything the oracle must replay is exact
    integer math: each element is integerized to positive micro-units
    (floor((x+2)·1e6+0.5) — the +2 shift keeps Spark's truncating `div`
    and DuckDB's flooring `//` in agreement), per-dimension means are
    exact integer sums divided by exact counts, and the drift is a sum
    of absolute integer differences — no float mean ever crosses the
    engine boundary, so sum-order cannot perturb parity.

    Scale shape: centroids broadcast; assignment is a narrow map over
    the corpus (no shuffle); the per-dimension mean is ONE map-side-
    combinable hash agg keyed on (centroid, dim) — k·d cells, tiny for
    any real k, d — and the old-centroid join is k·d rows broadcast.
    Integer headroom: micro ≤ 3e6, so the per-cell sum overflows long
    only past ~3e12 assigned vectors per centroid.
    """
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", _as_double("embedding").alias("vec"))
    cents = (
        e.where(F.col("vec_id") < _KMEANS_K)
        .select(F.col("vec_id").alias("cent_id"), _as_double("embedding").alias("cvec"))
    )

    def _micro(arr: Column) -> Column:
        return F.transform(
            arr, lambda x: F.floor((x + F.lit(2.0)) * F.lit(1000000.0) + F.lit(0.5))
        )

    sqdist = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "vec", "cent_id", sqdist.alias("sqdist")
    )
    w = Window.partitionBy("vec_id").orderBy("sqdist", "cent_id")
    # persist: BOTH the per-dim mean agg and the size agg read the
    # assignment, and the crossJoin + k·d distance evaluation + window
    # is the compute-dense heart of the step (CLAUDE.md shared-subplan
    # rule — without this the assignment runs twice)
    assigned = (
        dists.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).transform(scoped_persist)
    )
    elems = assigned.select(
        "cent_id", F.posexplode(_micro(F.col("vec"))).alias("pos", "micro")
    )
    means = (
        elems.groupBy("cent_id", "pos")
        .agg(F.sum("micro").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("cent_id", "pos", F.expr("s div n").alias("new_micro"))
    )
    old = cents.select(
        "cent_id", F.posexplode(_micro(F.col("cvec"))).alias("pos", "old_micro")
    )
    sizes = assigned.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_assigned"))
    return (
        means.join(F.broadcast(old), ["cent_id", "pos"])
        .groupBy("cent_id")
        .agg(F.sum(F.abs(F.col("new_micro") - F.col("old_micro"))).alias("drift_micro"))
        .join(F.broadcast(sizes), "cent_id")
        .select("cent_id", "n_assigned", "drift_micro")
    )


# ------------------------------------------- IVF with k-means centroids (r8)

IVFK_NLIST = 8  # floor cell count; actual nlist derives from the corpus

# Measured-good per-cell occupancy (SCALE.md r8 bucket/cell probes;
# re-confirmed by the r11 semdedup ladder: occupancy held at base =
# 80.5 s at 64x vs 2,321 s with nlist frozen at 8).  The registered
# cluster-then-compare keys derive nlist = max(IVFK_NLIST,
# n // TARGET_CELL) from the corpus count — the rule APPLIED, not just
# recorded (VERDICT r11 missing #2).  At every fixture scale
# (500/500/2000 vectors) the derived value is exactly IVFK_NLIST, so
# oracle parity is unchanged by construction; at the 64x probe layout
# (128k vectors) it derives 512, the measured scale-safe shape.
TARGET_CELL = 250

# Above this many cells the O(n·nlist) flat assign crossJoin is the
# dominant cost (SCALE.md r11: the re-parameterized semdedup path is
# assign-bound) and the corpus assignment switches to the two-level
# coarse quantizer (ncoarse = isqrt(nlist) router cells, then exact
# argmin within the routed group: O(n·2·sqrt(nlist)) distances).
# Fixture-derived nlist is always IVFK_NLIST < this threshold, so
# every SQL-oracled key computes the exact flat argmin its oracle
# encodes; the two-level math itself is hash-oracled at fixture scale
# by the dedicated q_ann_ivf_twolevel / q_semdedup_twolevel keys,
# which force two_level=True.
TWOLEVEL_MIN_NLIST = 64

# Multi-probe routing width for occupancy²-PAIR families (SemDeDup and
# every cluster-then-compare consumer): route each vector to its
# rprobe nearest ROUTER cells and take the exact argmin over the union
# of those groups' fine centroids.  r13 variant search
# (tools/router_balance_probe.py, numpy twin bit-exact to the engine
# pipeline, 64×/128k vectors/nlist=512):
#
#   variant                      Σocc²    max_occ  dist-ops/vec
#   flat (exact argmin)          36.4 M     574       1024
#   routed rprobe=1 (r12)       124.7 M   2,896         90.5
#   routed rprobe=2              60.8 M   1,670        137.1
#   routed rprobe=3              46.0 M   1,053        183.6
#   spread-quantile router      140.4 M   3,914         90.5
#   capped (balanced) groups    122.2 M   2,704         90.5
#
# The VERDICT r12 candidate mechanisms (spread router seeds, balanced
# fine→group caps) measurably do NOTHING — routing error, not router
# imbalance, concentrates occupancy, and widening the probe is the
# only lever that closes it.  rprobe=3 lands Σocc² within 1.26× of
# flat (routed rp1: 3.4×) and cuts the worst cell 2.7×, at 18% of the
# flat argmin's distance work.  Probe-bounded families (IVF/PQ serve —
# no pair stage) keep rprobe=1: balance buys them nothing (recall 1.0
# measured at rp1, SCALE.md r12).
TWOLEVEL_RPROBE_PAIR = 3

# Above this many centroids the AUTO assignment path routes two-level;
# at or below it (and ≥ TWOLEVEL_MIN_NLIST) auto runs the EXACT flat
# argmin as a closure-captured numpy matmul instead (r14): the router
# exists because the CATALYST flat argmin is O(n·nlist) zip_with folds
# (79.2 s at 64×/nlist=512 — SCALE.md r12), but the numpy matmul does
# the identical exact arithmetic in milliseconds per Arrow batch —
# measured end-to-end on the SemDeDup default at 64×: routed rp3
# 28.6–35.8 s vs numpy flat 13.3–13.4 s, with dropped = 126,579 (the
# exact-flat figure, vs 124,173 under rp3's boundary loss): exactness
# is FASTER here, strictly better dedup quality, perfectly balanced
# cells, and the result matches the flat SQL oracle at any scale
# (tools/batch_numpy_flat_probe.py, SCALE.md r14).
#
# Ceiling history: raised 8192 → 32768 at r14 close (blocked-flat vs
# numpy-routed-rp3 walls 2.4/1.9 s at nlist=2048, 5.5/6.6 s at 8192,
# 11.5/41–46 s at 32768 — flat won the span; tools/
# flat_crossover_probe.py).  r14-opt then found the 41–46 s routed
# wall was 42.2 s of DRIVER-side pure-python router construction and
# vectorized it (_router_groups): routed rp3 walls 1.3–2.2 s at 8192
# and 2.2–4.2 s at 32768 vs blocked-flat 3.3–5.6 / 8.8–9.8 on the
# same hour (tools/router_groups_vec_probe.py) — the SPEED crossover
# sits just below 8192.  The QUALITY side was then priced by the
# dropped/Σocc² ladder the previous comment demanded
# (tools/flat_quality_ladder.py, SCALE.md r14-opt; twin validated by
# reproducing the engine-measured 64× rung exactly): at the
# occupancy-250 layouts the n/250 rule actually produces in the band
# — nlist=8192 / 2.0M vectors, 16384 / 4.1M, 32768 / 8.2M — routed
# rp3's SemDeDup drop count is within 0.008% of exact flat (−155 /
# +3 / −11 rows of 2.0–8.2M drops) and Σocc² within ±5% (better at
# 8192), UNLIKE the nlist=512 layout where rp3 lost 1.9% of drops
# (126,579 → 124,173): at ncoarse = √nlist ≥ 90 the rp3 probe set
# covers the boundary mass.  Quality in 8192–32768 is a wash while
# routing is 4.5–6.9× faster (twin walls 431/95, 1193/304, 5078/735
# s), so the ceiling returned to the speed crossover.  Flat
# work/vector = nlist vs routed ≈ 2·rprobe·sqrt(nlist): at the n/250
# derivation the ceiling is a 2M-vector partition; 100 TB-scale
# nlist ≈ 10⁶ routes, as it must.
NUMPY_FLAT_MAX_NLIST = 8192

# Above this many centroids the AUTO path stops collecting the
# centroid table driver-side at all (r15, VERDICT r14 next #1 — the
# one genuine scale-killer left on the ANN/semdedup hot path: the
# numpy router is O(nlist·d) DRIVER memory and per-worker closure
# bytes, unmeasured past 32768 until tools/routed_collect_probe.py).
# Measured on synthetic micro-unit centroids at d=64 (SCALE.md r15):
# the Arrow collect (_cents_np) holds 8·d B/centroid — a 128 MB
# matrix at nlist=262144, ΔRSS ≤ 1.75× that, collected in 0.64 s
# (the r14 row-wise .collect() path cost 6.91 s and +821 MB RSS at
# 262144 — ~3.2 KB/centroid of python objects; it no longer exists)
# — and the numpy routed assign stays 9.5-23× faster than the
# distributed Catalyst router through 262144 (8.6 s vs 197.6 s at
# 131072; 30.1 s vs 285.1 s at 262144, 131072 vectors assigned
# end-to-end).  Past the ceiling auto falls back to that CATALYST
# two-level routing — bit-identical cells (the same
# test_numpy_routed_equals_catalyst_routed contract), everything
# distributed: the corpus routes against isqrt(nlist) broadcast
# seeds and the fine stage is an equi-join, so nothing O(nlist·d)
# ever materializes on the driver or in a python worker; the fine
# table's broadcast hint is also dropped past the ceiling so the
# planner may shuffle-join it (a >128 MB broadcast build side is
# its own hazard).  At the n/250 derivation the ceiling corresponds
# to a ~65M-vector partition of the problem.
ROUTED_DRIVER_MAX_NLIST = 262144

# Centroid-column block width for the numpy flat matmul (r14 close):
# the distance matrix is computed NUMPY_CENT_BLOCK centroids at a time
# with a running (sq, cid) min across blocks, keeping the per-chunk
# working set cache-sized and per-task memory flat in nlist.  Width is
# MEASURED, not a guess: at nlist=8192 the flat assign walls 42–48 s
# single-block, 13.0–17.8 s at width 2048, 4.7–7.6 s at width 1024,
# 6.5–7.7 s at 512 (tools/flat_crossover_probe.py --blkwidth rows,
# SCALE.md r14 close) — the apparent "matmul cliff" past nlist≈4096
# was memory traffic (2048×nlist×8 B temporaries thrashing cache),
# not distance work; 2048×1024×8 B ≈ 16 MB fits L2/L3 and restored
# the BLAS-bound wall.
NUMPY_CENT_BLOCK = 1024

_NVEC_CACHE: dict[str, int] = {}


def invalidate_nvec_cache(sf_dir: str | None = None) -> None:
    """Drop the cached embeddings count for ``sf_dir`` (or all dirs).
    ADVICE r12: derived_nlist pins the count per sf_dir for the process
    lifetime — correct for immutable fixture dirs, but any
    retrain/compaction-style caller that re-derives nlist over a
    directory that GAINS files mid-process must call this first or
    nlist silently freezes at the first count (the same growing-log
    class as the r12 CacheManager stale-plan trap).  The streaming
    retrain paths are immune — they count an explicit file-list
    snapshot (_retrain_cents), never this cache."""
    if sf_dir is None:
        _NVEC_CACHE.clear()
    else:
        _NVEC_CACHE.pop(str(sf_dir), None)


def derived_nlist(spark: SparkSession, sf_dir: str) -> int:
    """nlist ≈ n / TARGET_CELL (floored at IVFK_NLIST) from the corpus
    count — cached per sf_dir: the registered keys and persisted
    builders only ever point this at IMMUTABLE fixture/probe dirs, so
    the count job runs once per process per corpus.  A caller whose
    dir can gain files must invalidate_nvec_cache(sf_dir) first
    (ADVICE r12); the streaming retrain paths instead count explicit
    file-list snapshots and never read this cache."""
    key = str(sf_dir)
    if key not in _NVEC_CACHE:
        _NVEC_CACHE[key] = load(spark, sf_dir, "embeddings").count()
    return max(IVFK_NLIST, _NVEC_CACHE[key] // TARGET_CELL)

# Filtered queries probe MORE cells: a label predicate keeps only
# ~1/|labels| of each probed cell, so recall needs a wider probe set
# (measured at 64x: `tools/ann_bits_probe.py 64 filtered`, SCALE.md
# r10 — same-label recall@5 is 0.867 at nprobe=2 and 0.990 at
# nprobe=4, at roughly equal serve wall-clock).
IVFK_NPROBE_F = 4

# Shared k-means training + assignment CTE chain (vecs → seeds → one
# Lloyd round → cents → d1 → assign): the ONE training contract the
# ANN-with-trained-centroids family and the SemDeDup family both ride
# (an edit here changes all of them in lockstep — that is the point;
# previously _SEMDEDUP_ASSIGN hand-duplicated this text, ADVICE r11).
# The seeds predicate encodes the DERIVED nlist (max(IVFK_NLIST,
# n // TARGET_CELL)) as a scalar subquery so the oracle and the Spark
# builders compute the same cell count at ANY corpus size, not only at
# the fixture scales where it equals IVFK_NLIST.
_IVFK_TRAIN_ASSIGN = f"""vecs AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), seeds AS (
      SELECT vec_id AS cid, vm AS cm FROM vecs
      WHERE vec_id < (SELECT greatest({IVFK_NLIST}, count(*) // {TARGET_CELL})
                      FROM vecs)
    ), d0 AS (
      SELECT v.vec_id, s.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - s.cm[i]) * (v.vm[i] - s.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN seeds s
    ), a0 AS (
      SELECT vec_id, cid FROM d0
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), elems AS (
      SELECT a.cid, unnest(range(1, len(v.vm) + 1)) AS pos, unnest(v.vm) AS m
      FROM a0 a JOIN vecs v USING (vec_id)
    ), cmeans AS (
      SELECT cid, pos, CAST(sum(m) AS BIGINT) // count(*) AS nm
      FROM elems GROUP BY cid, pos
    ), cents AS (
      SELECT cid, list(nm ORDER BY pos) AS cm FROM cmeans GROUP BY cid
    ), d1 AS (
      SELECT v.vec_id, c.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - c.cm[i]) * (v.vm[i] - c.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN cents c
    ), assign AS (
      SELECT vec_id, cid AS cell FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    )"""

_IVFK_SQL = f"""
    WITH {_IVFK_TRAIN_ASSIGN}, probes AS (
      SELECT vec_id AS q_id, cid AS cell FROM d1 WHERE vec_id <= {KNN_QUERIES}
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) <= {IVF_NPROBE}
    ), scored AS (
      SELECT p.q_id, a.vec_id,
             list_reduce(list_transform(range(1, len(q.vm) + 1),
                  i -> (q.vm[i] - t.vm[i]) * (q.vm[i] - t.vm[i])),
               (acc, x) -> acc + x) AS sq
      FROM probes p
      JOIN assign a ON a.cell = p.cell
      JOIN vecs q ON q.vec_id = p.q_id
      JOIN vecs t ON t.vec_id = a.vec_id
      WHERE a.vec_id <> p.q_id
    )
    SELECT q_id, vec_id AS neighbor_id,
           CAST(sq AS BIGINT) AS sq_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, sq,
             row_number() OVER (PARTITION BY q_id ORDER BY sq, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {KNN_K}
    """


def _micro_arr(emb_col: str) -> Column:
    """Positive integer micro-units (the q_kmeans_update shift: +2 keeps
    Spark div and DuckDB // in agreement on the mean)."""
    return F.transform(
        _as_double(emb_col),
        lambda x: F.floor((x + F.lit(2.0)) * F.lit(1000000.0) + F.lit(0.5)),
    )


def _int_sqdist(a: Column, b: Column) -> Column:
    """Exact integer squared L2 over micro-unit arrays — headroom:
    diff ≤ 4e6 → sq ≤ 1.6e13, × 64 dims ≈ 1e15, well inside int64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _ivfk_cents(
    vecs: DataFrame,
    nlist: int = IVFK_NLIST,
    two_level: bool | None = None,
    rprobe: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """One exact-integer Lloyd round from deterministic seeds (the
    nlist lowest vec_ids) → persisted (cid, cm) centroid table.
    ``vecs`` needs (vec_id, vm); extra columns are ignored.  Shared by
    the in-plan key, the index builder, and the filtered variant so
    all three train byte-identical centroids (one oracle contract).

    r12: the Lloyd argmin is the SAME O(n·nlist) stage as the corpus
    assignment (the 64× breakdown measured it at 45.0 s of the 49 s
    routed build), so it routes through the identical two-level
    machinery — _assign_cells over the SEEDS frame — past
    TWOLEVEL_MIN_NLIST (auto) or when forced.  At every fixture scale
    the flat branch runs, byte-identical to the pre-r12 training, so
    the shared oracle contract is untouched; the routed training has
    its own cross-engine proof in q_ann_ivf_twolevel /
    q_semdedup_twolevel, whose oracles train routed end-to-end."""
    if seeds is None:
        seeds = vecs.where(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("cid"), F.col("vm").alias("cm")
        )
    # callers with no guaranteed id range (the streaming retrain
    # kernel) pass their own rank-based (cid, cm) seed frame — the
    # Lloyd round and routing are identical from there (r13)
    a0 = _assign_cells(
        vecs.select("vec_id", "vm"), seeds, nlist, two_level, rprobe=rprobe
    ).select(F.col("cell").alias("cid"), "vm")
    cents = (
        a0.select("cid", F.posexplode("vm").alias("pos", "m"))
        .groupBy("cid", "pos")
        .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("cid", "pos", F.expr("s div n").alias("nm"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "nm"))), lambda s: s["nm"]
            ).alias("cm")
        )
    )
    # the trained centroid table feeds BOTH the corpus assignment and
    # the query probes — nlist x d integers, cheap to cache, expensive
    # to recompute (it embeds the full Lloyd pass)
    return scoped_persist(cents)


def _cents_np(cents: DataFrame):
    """Collect a (cid, cm) centroid table driver-side as numpy — the
    Arrow path (toPandas + stack), NOT row-wise ``.collect()`` into
    python int lists (r15, VERDICT r14 next #1): python-object rows
    cost ~2.4 KB/centroid at d=64 (measured 630+ MB RSS and tens of
    seconds at nlist=262144) where the numpy matrix is 8·d bytes/row
    (134 MB) and arrives in ~1/20 the wall.  Returns (cids int64
    ascending, C float64) — every numpy assign/router path consumes
    exactly this shape.  The sub-2^53 exactness contract is asserted
    here once for all of them: 2·d·M² < 2^53 (the DECOMPOSED distance
    form's true sufficient condition — the x²+Σc² intermediate, not
    the product term, is what must stay exact; ADVICE r14)."""
    import numpy as np

    pdf = cents.select("cid", "cm").toPandas()
    cids = pdf["cid"].to_numpy().astype(np.int64)
    C = (
        np.stack(pdf["cm"].to_numpy()).astype(np.float64)
        if len(pdf)
        else np.zeros((0, 0), dtype=np.float64)
    )
    o = np.argsort(cids, kind="stable")
    cids, C = cids[o], C[o]
    _assert_sub53(C)
    return cids, C


def _assert_sub53(*mats) -> None:
    """Loud guard for the decomposed-float64 exactness contract every
    numpy distance path in this module relies on: all terms of
    x² + c² − 2·x·c are integers and every intermediate (the largest
    is the x²+c² partial-sum chain, ≤ 2·d·M²) stays below 2^53, so
    the float64 arithmetic is EXACT.  The sufficient condition is
    2·d·M² < 2^53 (|coord| ≤ ~8.39e6 at d=64, ~4.19e6 at d=256 —
    micro-unit vectors sit at ≤ ~4.3e6); the r14 docstring overclaimed
    256·M² < 2^53, which the intermediate can exceed at d=256
    (ADVICE r14 medium).  Raises instead of silently returning
    non-reference cells."""
    import numpy as np

    for M in mats:
        if M.size == 0:
            continue
        d = M.shape[-1]
        mx = float(np.abs(M).max())
        if 2.0 * d * mx * mx >= 2.0**53:
            raise ValueError(
                f"micro-unit coordinate {mx:.3g} at d={d} breaks the "
                f"2*d*M^2 < 2^53 float64-exactness contract of the "
                f"numpy distance paths (max |coord| allowed: "
                f"{(2.0 ** 52 / d) ** 0.5:.3g})"
            )


def _numpy_flat_assign(
    vecs: DataFrame, cents: DataFrame, keep: tuple[str, ...] = ("vm",)
) -> DataFrame:
    """EXACT flat argmin as a closure-captured numpy matmul (r14): the
    same (sq, cid) min_by the Catalyst crossJoin computes, in one
    Arrow-batched mapInPandas — value-identical at any nlist (exact
    integer distances below 2^53, argmin over cid-sorted columns IS
    the tie-break; the same proof as pipelines._numpy_assign, whose
    streaming equality tests pin the arithmetic).  Centroids collect
    driver-side (nlist ≤ NUMPY_FLAT_MAX_NLIST rows — the sanctioned
    bounded-collect class) and the matmul is CHUNKED at 2048 rows AND
    BLOCKED at NUMPY_CENT_BLOCK centroid columns with a running
    (sq, cid) min across blocks (r14 close), so a task's distance
    matrix peaks at 2048 × 8192 × 8 B ≈ 134 MB at ANY nlist — what
    bounds this path is distance WORK (O(n·nlist), quadratic in the
    corpus under the n/250 derivation), not task memory.  Blocks
    iterate in ascending-cid order and the running min updates on
    strict <, so an across-block tie keeps the earlier (lower) cid —
    blocking preserves the exact (sq, cid) tie-break bit-for-bit
    (test_numpy_flat_blocked_equality).  Measured at 64×/nlist=512:
    the SemDeDup default end-to-end fell 28.6–35.8 s (routed rp3) →
    13.3–13.4 s with EXACT cells (SCALE.md r14)."""
    import numpy as np

    cids, C = _cents_np(cents)  # Arrow, not python rows (r15)
    c2 = (C * C).sum(axis=1)
    in_cols = list(dict.fromkeys(("vec_id", "vm") + tuple(keep)))
    src = vecs.select(*in_cols)
    out_fields = [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.LongType()),
    ] + [src.schema[k] for k in keep]

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf["vm"].to_numpy()).astype(np.float64)
            cell = np.empty(len(X), dtype=np.int64)
            for lo in range(0, len(X), 2048):
                Xc = X[lo : lo + 2048]
                x2 = (Xc * Xc).sum(axis=1)[:, None]
                best_sq = np.full(len(Xc), np.inf)
                bcell = np.empty(len(Xc), dtype=np.int64)
                for cl in range(0, len(C), NUMPY_CENT_BLOCK):
                    Cb = C[cl : cl + NUMPY_CENT_BLOCK]
                    sq = (
                        x2
                        + c2[None, cl : cl + len(Cb)]
                        - 2.0 * (Xc @ Cb.T)
                    )
                    loc = sq.argmin(axis=1)
                    v = sq[np.arange(len(Xc)), loc]
                    upd = v < best_sq
                    best_sq[upd] = v[upd]
                    bcell[upd] = cids[cl + loc[upd]]
                cell[lo : lo + len(Xc)] = bcell
            out = {
                "vec_id": pdf["vec_id"].astype("int64"),
                "cell": pd.Series(cell, index=pdf.index),
            }
            for k in keep:
                out[k] = pdf[k]
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=T.StructType(out_fields))


def _router_groups(cents_rows: list) -> tuple[list, dict]:
    """Driver-side two-level router construction — the SAME groups the
    Catalyst routed branch computes Spark-side: router seeds = the
    isqrt(nlist) lowest-cid centroids, each fine centroid routed to
    its (gsq, gid)-min seed.  Shared by the batch numpy-routed path
    below and the streaming literal-CASE / numpy branches (pipelines
    re-exports it) so every impl mirrors one router.  (Moved here from
    streaming/pipelines.py at r14 close so operators need not import
    the streaming layer.)

    The fine→seed routing is a vectorized float64 matmul identity —
    exact for micro-unit coordinates: all terms are integers and the
    sufficient condition is 2·d·M² < 2^53 (the x²+Σs² intermediate of
    the decomposed form is the largest term — |coord| ≤ ~8.39e6 at
    d=64, ~4.19e6 at d=256; asserted by _assert_sub53, ADVICE r14 —
    the r14 text overclaimed 256·M² < 2^53, which the intermediate
    can exceed at d=256).  The stable argmin reproduces the
    (gsq, gid) lexicographic tie-break because seeds are
    cid-ascending.  The r14-close pure-python loop cost 42.2 s at
    nlist=32768 (O(nlist·ncoarse·d) interpreted ops) and was the real
    cliff behind the routed ladder's 41–46 s wall — the vectorized
    build runs 1.6 s on the identical inputs, group-for-group equal
    (planted duplicate-centroid ties included;
    test_router_groups_vectorized_equals_reference, and the Spark-side
    cross-check test_numpy_routed_equals_catalyst_routed).  Empty
    input returns ([], {}) — the streaming caller's contemplated
    empty-centroids case (ADVICE r14 low)."""
    import numpy as np

    if not cents_rows:
        return [], {}
    rows = sorted((int(cid), [int(e) for e in cm]) for cid, cm in cents_rows)
    C = np.asarray([cm for _, cm in rows], dtype=np.float64)
    _assert_sub53(C)
    ncoarse, assign = _router_groups_np(C)
    cseeds = rows[:ncoarse]  # lowest-cid centroids double as the router
    gid_of = [gid for gid, _ in cseeds]
    groups: dict[int, list] = {gid: [] for gid, _ in cseeds}
    for (cid, cm), j in zip(rows, assign):
        groups[gid_of[j]].append((cid, cm))
    return cseeds, groups


def _router_groups_np(C, blk: int | None = None):
    """numpy core of the two-level router construction: given the
    cid-ASCENDING fine-centroid matrix (float64 of exact integers,
    caller asserts the sub-2^53 contract), route every fine row to
    its (gsq, gid)-min seed among the first ncoarse = isqrt(n) rows.
    Returns (ncoarse, assign) with assign[i] = seed POSITION (0-based
    row index into the first ncoarse rows).  Shared by the list-API
    wrapper above (streaming literal-CASE branch, equality tests) and
    the numpy-native batch router (_numpy_routed_assign), so every
    impl mirrors ONE routing."""
    import math

    import numpy as np

    n = len(C)
    ncoarse = max(1, math.isqrt(n))
    S = C[:ncoarse]
    ssq = (S * S).sum(axis=1)
    assign = np.empty(n, dtype=np.int64)
    # Block fine rows so the distance matrix stays ~128 MB even at
    # very large ncoarse; within a block the matmul is one BLAS call.
    # ``blk`` is overridable so tests can pin the multi-block path
    # (ADVICE r14 low: every production layout below ~63k cells runs
    # single-block, leaving s > 0 untested otherwise).
    if blk is None:
        blk = max(256, 16_000_000 // ncoarse)
    for s in range(0, n, blk):
        Cb = C[s : s + blk]
        sq = (Cb * Cb).sum(axis=1)[:, None] + ssq[None, :] - 2.0 * (Cb @ S.T)
        assign[s : s + blk] = sq.argmin(axis=1)
    return ncoarse, assign


def _numpy_routed_assign(
    vecs: DataFrame,
    cents: DataFrame,
    keep: tuple[str, ...] = ("vm",),
    rprobe: int = 1,
) -> DataFrame:
    """Two-level multi-probe argmin as closure-captured numpy (r14
    close) — the batch twin of pipelines._numpy_assign's two-level
    branch, with keep-column pass-through and a bigint cell.  Cell-for-
    cell equal to the Catalyst routed branch of _assign_cells at the
    same rprobe (same _router_groups, exact integer distances in
    float64, stable argsort = the (gsq, gid) router tie-break, running
    strict-<-or-lower-cid min across probed groups = the union's
    (sq, cid) min_by) — pinned by test_numpy_routed_equals_catalyst_
    routed.  This replaces the Catalyst router on the AUTO past-
    ceiling path: measured at 128k vectors, numpy routing walls
    7.6–8.7 s vs Catalyst 26.4–31.8 s at nlist=8192 and 41–46 s vs
    57–61 s at 32768 (tools/flat_crossover_probe.py, SCALE.md r14
    close); after _router_groups went vectorized (r14-opt — the 32768
    wall was 42.2 s of driver-side router construction) the same legs
    read 1.9–2.2 s at 8192 and 3.5–4.2 s at 32768
    (tools/router_groups_vec_probe.py).  Forced two_level=True keeps
    the Catalyst machinery (the pinned oracle-proof keys encode that
    expression tree)."""
    import numpy as np

    # Arrow collect + numpy-core routing end to end (r15, VERDICT r14
    # next #1): no python-object centroid rows anywhere — the r14 path
    # paid a row-wise .collect() (~2.4 KB/centroid driver RSS) plus a
    # list→numpy rebuild per group; this one holds exactly ONE float64
    # matrix (8·d B/centroid) and groups by index slices.
    cids, C = _cents_np(cents)
    ncoarse, rassign = _router_groups_np(C)
    G = C[:ncoarse]
    rp = min(rprobe, ncoarse)
    # group members by seed position: stable argsort of the fine→seed
    # assignment keeps members cid-ascending within each group (cids
    # are ascending from _cents_np), exactly the list impl's order
    order = np.argsort(rassign, kind="stable")
    bounds = np.searchsorted(rassign[order], np.arange(ncoarse + 1))
    fine = {}
    for j in range(ncoarse):
        mem = order[bounds[j] : bounds[j + 1]]
        if len(mem):
            fine[j] = (cids[mem], np.ascontiguousarray(C[mem]))
    in_cols = list(dict.fromkeys(("vec_id", "vm") + tuple(keep)))
    src = vecs.select(*in_cols)
    out_fields = [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.LongType()),
    ] + [src.schema[k] for k in keep]

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf["vm"].to_numpy()).astype(np.float64)
            gsq = (
                (X * X).sum(axis=1)[:, None]
                + (G * G).sum(axis=1)[None, :]
                - 2.0 * (X @ G.T)
            )
            probed = np.argsort(gsq, axis=1, kind="stable")[:, :rp]
            best_sq = np.full(len(X), np.inf)
            cell = np.zeros(len(X), dtype=np.int64)
            for j in range(ncoarse):
                if j not in fine:
                    continue
                mask = (probed == j).any(axis=1)
                if not mask.any():
                    continue
                mcids, M = fine[j]
                Xm = X[mask]
                msq = (
                    (Xm * Xm).sum(axis=1)[:, None]
                    + (M * M).sum(axis=1)[None, :]
                    - 2.0 * (Xm @ M.T)
                )
                loc = msq.argmin(axis=1)
                gsqm = msq[np.arange(len(Xm)), loc]
                gcid = mcids[loc]
                idx = np.flatnonzero(mask)
                upd = (gsqm < best_sq[idx]) | (
                    (gsqm == best_sq[idx]) & (gcid < cell[idx])
                )
                best_sq[idx[upd]] = gsqm[upd]
                cell[idx[upd]] = gcid[upd]
            out = {
                "vec_id": pdf["vec_id"].astype("int64"),
                "cell": pd.Series(cell, index=pdf.index),
            }
            for k in keep:
                out[k] = pdf[k]
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=T.StructType(out_fields))


def _assign_cells(
    vecs: DataFrame,
    cents: DataFrame,
    nlist: int,
    two_level: bool | None = None,
    keep: tuple[str, ...] = ("vm",),
    rprobe: int | None = None,
) -> DataFrame:
    """Corpus → cell assignment, the stage every cluster-then-compare
    family shares.  Below TWOLEVEL_MIN_NLIST cells: the exact flat
    argmin (one O(n·nlist) broadcast crossJoin — what every registered
    oracle encodes).  At or above it (or with two_level=True): the
    TWO-LEVEL coarse quantizer (VERDICT r11 missing #1) — route each
    vector to its nearest of ncoarse = isqrt(nlist) coarse cells (the
    lowest-cid trained centroids double as the router), then exact
    argmin among only the fine centroids routed to that coarse cell:
    O(n·(ncoarse + nlist/ncoarse)) ≈ O(n·2·sqrt(nlist)) distances, and
    the corpus never crossJoins the full centroid table (the fine
    stage is an equi-join on the router cell).  Deterministic: every
    argmin tie-breaks (distance, id), so the assignment is a pure
    function of the corpus — hash-oracled at fixture scale by
    q_ann_ivf_twolevel / q_semdedup_twolevel.

    ``vecs`` needs (vec_id, vm, *keep); output is (vec_id, cell,
    *keep) with the same min_by tie-break as the flat path.

    ``rprobe`` (r13, VERDICT r12 next #2): route each vector to its
    rprobe NEAREST router cells (not just the first) and take the
    exact argmin over the union of those groups' fine centroids —
    multi-probe routing, the measured cure for routed occupancy
    concentration (see TWOLEVEL_RPROBE_PAIR's variant table: Σocc²
    124.7M at rprobe=1 → 46.0M at rprobe=3 vs 36.4M flat).  The
    router stage is a pure PROJECTION against a broadcast 1-row array
    of router structs (array_sort + slice — no window, no extra
    shuffle: the only corpus-sized exchange remains the final n-row
    min_by agg), so shuffle volume is identical to rprobe=1.

    AUTO POLICY (r14 — unified with the streaming twin, closing the
    ADVICE r13 divergence): in the window TWOLEVEL_MIN_NLIST ≤ nlist ≤
    NUMPY_FLAT_MAX_NLIST, auto runs the EXACT flat argmin as a blocked
    numpy matmul (_numpy_flat_assign — fastest impl in the window AND
    exact: measured faster than routing through nlist=8192 once the
    centroid block is cache-sized, and strictly better quality at the
    64× default: dropped 126,579 exact vs 124,173 under rp3's
    boundary loss at nlist=512), so mixed batch/stream consumers
    sharing one centroid table get IDENTICAL exact cells there.  Past
    the ceiling both sides route multi-probe NUMPY
    (_numpy_routed_assign) at rprobe=TWOLEVEL_RPROBE_PAIR when the
    caller left ``rprobe=None`` — 2.3–4× faster than blocked flat at
    8192–32768 after the r14-opt _router_groups vectorization, and
    QUALITY-equal at the occupancy-250 layouts of that band (drop
    count within 0.008% of exact, Σocc² within ±5% — the
    flat_quality_ladder rows on NUMPY_FLAT_MAX_NLIST's comment; the
    512-layout quality gap does not recur at ncoarse ≥ 90).
    ``rprobe=None`` means AUTO (rp3 past the ceiling, the
    balance-safe width — r13 refuted rp1's cells); an explicit
    integer is honored everywhere; forced two_level paths default it
    to 1 (today's pinned behavior).
    Forced two_level=True keeps the CATALYST routed machinery (the
    pinned proof keys q_ann_ivf_twolevel / q_semdedup_twolevel /
    q_semdedup_rprobe train and assign routed end-to-end — their
    oracles encode that expression tree exactly)."""
    use2l = (nlist >= TWOLEVEL_MIN_NLIST) if two_level is None else two_level
    if two_level is None and use2l:
        if nlist <= NUMPY_FLAT_MAX_NLIST:
            # r14 auto window [TWOLEVEL_MIN_NLIST, NUMPY_FLAT_MAX_NLIST]:
            # the EXACT blocked numpy-flat argmin beats routing outright
            # (NUMPY_FLAT_MAX_NLIST's ladder), so the routed
            # approximation is reserved for forced two_level (the pinned
            # proof keys) and for nlist past the measured crossover.
            return _numpy_flat_assign(vecs, cents, keep)
        if nlist <= ROUTED_DRIVER_MAX_NLIST:
            # past the flat ceiling but inside the driver-collect
            # window: numpy multi-probe routing, balance-safe width
            # when unspecified (the streaming twin's auto rule)
            return _numpy_routed_assign(
                vecs, cents, keep,
                rprobe=TWOLEVEL_RPROBE_PAIR if rprobe is None else rprobe,
            )
        # past ROUTED_DRIVER_MAX_NLIST (r15): never materialize
        # O(nlist·d) on the driver — fall through to the DISTRIBUTED
        # Catalyst two-level routing below (bit-identical cells at the
        # same rprobe), at the pair-family probe width by default.
        rprobe = TWOLEVEL_RPROBE_PAIR if rprobe is None else rprobe
    rprobe = 1 if rprobe is None else rprobe
    if not use2l:
        return (
            vecs.crossJoin(F.broadcast(cents))
            .select(
                "vec_id", *keep, "cid",
                _int_sqdist(F.col("vm"), F.col("cm")).alias("sq"),
            )
            .groupBy("vec_id")
            .agg(
                F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cell"),
                *[F.first(k).alias(k) for k in keep],
            )
        )
    ncoarse = max(1, math.isqrt(nlist))
    # intermediate stages must carry vm for the fine distance even
    # when the caller only keeps other columns (e.g. the PQ encode
    # keeps evec)
    carry = tuple(dict.fromkeys(("vm",) + keep))
    wseed = Window.orderBy("cid")  # nlist rows — single-task is fine
    cseeds = F.broadcast(
        cents.withColumn("rn", F.row_number().over(wseed))
        .where(F.col("rn") <= ncoarse)
        .select(F.col("cid").alias("gid"), F.col("cm").alias("gm"))
    )
    # fine centroid → router cell (nlist × ncoarse, trivial)
    cgrp = (
        cents.crossJoin(cseeds)
        .select(
            "cid", "cm", "gid",
            _int_sqdist(F.col("cm"), F.col("gm")).alias("gsq"),
        )
        .groupBy("cid")
        .agg(
            F.min_by("gid", F.struct(F.col("gsq"), F.col("gid"))).alias("gid"),
            F.first("cm").alias("cm"),
        )
    )
    rp = min(rprobe, ncoarse)
    if rp <= 1:
        # vector → router cell (n × ncoarse — the only corpus-sized
        # crossJoin, against isqrt(nlist) rows)
        vg = (
            vecs.crossJoin(cseeds)
            .select(
                "vec_id", *carry, "gid",
                _int_sqdist(F.col("vm"), F.col("gm")).alias("gsq"),
            )
            .groupBy("vec_id")
            .agg(
                F.min_by("gid", F.struct(F.col("gsq"), F.col("gid"))).alias("gid"),
                *[F.first(k).alias(k) for k in carry],
            )
        )
    else:
        # vector → top-rp router cells as a PROJECTION: the ncoarse
        # router rows collapse to one broadcast array row; per vector,
        # transform → array_sort((gsq, gid) structs — lexicographic IS
        # the tie-break) → slice(1, rp) → explode.  No window, no
        # n×ncoarse shuffle; n×rp rows feed the fine equi-join.
        routers = F.broadcast(
            cseeds.agg(
                F.array_sort(F.collect_list(F.struct("gid", "gm"))).alias("rts")
            )
        )

        def _gstruct(r):
            return F.struct(
                _int_sqdist(F.col("vm"), r["gm"]).alias("gsq"),
                r["gid"].alias("gid"),
            )

        vg = (
            vecs.crossJoin(routers)
            .select(
                "vec_id", *carry,
                F.explode(
                    F.slice(
                        F.array_sort(F.transform(F.col("rts"), _gstruct)), 1, rp
                    )["gid"]
                ).alias("gid"),
            )
        )
    # exact argmin within the routed group — equi-join on gid, never
    # the full centroid table.  The broadcast hint is only safe while
    # the fine table is modest; past ROUTED_DRIVER_MAX_NLIST (the r15
    # distributed fallback's regime) the planner may shuffle-join it
    # — a nlist×d build side beyond the driver window is exactly the
    # hazard this branch exists to avoid (guide §3.1).
    cgrp_side = F.broadcast(cgrp) if nlist <= ROUTED_DRIVER_MAX_NLIST else cgrp
    return (
        vg.join(cgrp_side, "gid")
        .select(
            "vec_id", *keep, "cid",
            _int_sqdist(F.col("vm"), F.col("cm")).alias("sq"),
        )
        .groupBy("vec_id")
        .agg(
            F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cell"),
            *[F.first(k).alias(k) for k in keep],
        )
    )


def ivf_kmeans_topk(
    spark: SparkSession,
    sf_dir: str,
    nlist: int | None = None,
    nprobe: int | None = None,
    two_level: bool | None = None,
) -> DataFrame:
    """Parameterized IVF-with-trained-centroids build+serve (the
    q_ann_ivf_kmeans pipeline with nlist exposed): nlist is the IVF
    deployment knob — by default it DERIVES from the corpus
    (max(IVFK_NLIST, n // TARGET_CELL), VERDICT r11 missing #2) so
    cells stay occupancy-bounded as the corpus grows and
    nprobe/nlist keeps shrinking the scanned fraction; past
    TWOLEVEL_MIN_NLIST cells the corpus assignment auto-switches to
    the two-level coarse quantizer (_assign_cells).  Defaults
    reproduce the registered key exactly at every fixture scale
    (derived nlist = IVFK_NLIST there); tools/ann_bits_probe.py
    measures recall + wall-clock at 64x under the
    re-parameterization."""
    nlist = derived_nlist(spark, sf_dir) if nlist is None else nlist
    nprobe = IVF_NPROBE if nprobe is None else nprobe
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", _micro_arr("embedding").alias("vm"))
    # one Lloyd round: nearest seed by exact integer L2, then exact
    # integer per-(cell, dim) means (map-side min_by — one row per
    # vector crosses the shuffle); both O(n·nlist) argmins (Lloyd and
    # assign) route two-level past the threshold (r12)
    cents = _ivfk_cents(vecs, nlist, two_level)
    assign = _assign_cells(vecs, cents, nlist, two_level)
    qd = (
        vecs.where(F.col("vec_id") <= KNN_QUERIES)
        .crossJoin(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("vm").alias("qm"),
            "cid",
            _int_sqdist(F.col("vm"), F.col("cm")).alias("sq"),
        )
    )
    wp = Window.partitionBy("q_id").orderBy("sq", "cid")
    probes = (
        qd.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "qm", F.col("cid").alias("cell"))
    )
    cand = assign.join(probes, "cell").where(F.col("vec_id") != F.col("q_id"))
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        cand.select(
            "q_id", "vec_id", _int_sqdist(F.col("qm"), F.col("vm")).alias("sq")
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register("q_ann_ivf_kmeans", sql=_IVFK_SQL)
def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with TRAINED centroids: deterministic k-means seeds (the
    nlist lowest vec_ids) refined by one exact-integer Lloyd round,
    then the standard IVF assign/probe/re-rank — the honest nlist
    story q_ann_ivf (label-mean cells) cannot tell, because label
    count is fixed by the data while k-means nlist is a free knob a
    deployment scales ≈ n / target_cell (measured at 64x in SCALE.md
    r8).  Fully hash-oracled with ZERO float parity surface: vectors
    are integerized once (the q_kmeans_update +2-shift micro-units)
    and every distance — Lloyd, assignment, probe, final rank — is an
    exact int64 squared-L2; centroid means are exact integer
    divisions.  Scale shape: two O(n·nlist) broadcast passes (Lloyd +
    assign, one row per vector crosses each shuffle via min_by), an
    nlist×d cells agg, and a serve stage bounded by nprobe cells per
    query."""
    return ivf_kmeans_topk(spark, sf_dir)


def build_ivf_kmeans_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Persist the trained-centroid IVF index ONCE: the Lloyd-refined
    integer centroids plus the cell assignments (with the micro-unit
    vectors, so serving never re-reads the fixture corpus),
    partitioned BY CELL for directory-pruned probes — the
    build_ivf_index contract with k-means centroids.  At 100 TB the
    two O(n·nlist) passes happen once offline; every query batch pays
    only nprobe cells."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "ivf_kmeans")
    meta = os.path.join(path, "_INDEX_META.json")
    if _index_is_current(meta, kind="ivf_kmeans") and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    # identical derivation to ivf_kmeans_topk (shared oracle contract);
    # assignments additionally carry the label column (fmt 2) so
    # filtered serving can evaluate metadata predicates INSIDE the
    # cell-pruned scan without touching the fixture corpus
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", "label", _micro_arr("embedding").alias("vm"))
    nlist = derived_nlist(spark, sf_dir)
    # fmt 4: PAIR-GRADE cells — the ONE persisted index serves both the
    # probe-bounded ANN family (indifferent to balance: recall is
    # nprobe-governed) and the occupancy² pair consumers
    # (q_semdedup_serve / q_semdedup_clusters_serve), so it builds with
    # multi-probe routing (Σocc² 46.0M vs 124.7M at rprobe=1 at
    # 64×/nlist=512 — TWOLEVEL_RPROBE_PAIR's table) rather than
    # splitting into two artifacts (VERDICT r12 missing #3).  Fixture
    # scale runs the flat branch either way — the shared _IVFK_SQL
    # oracle is untouched.
    cents = _ivfk_cents(vecs, nlist, rprobe=TWOLEVEL_RPROBE_PAIR)
    assign = _assign_cells(
        vecs, cents, nlist, keep=("vm", "label"), rprobe=TWOLEVEL_RPROBE_PAIR
    )
    cents.write.parquet(os.path.join(path, "centroids"))
    # (cell, label) two-level partitioning (fmt 3): the unfiltered
    # serve prunes on cell alone (label dirs are transparent to it —
    # pinned read schema), the filtered serve prunes BOTH levels, so a
    # selective predicate skips whole directories instead of filtering
    # rows inside probed cells.  Cost: nlist x |labels| directories —
    # the knob is only worth promoting for low-cardinality filter
    # columns (10 labels here; a high-cardinality column would shatter
    # the layout into tiny files).
    write_partitioned(assign, os.path.join(path, "assignments"), "cell", "label")
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"kind": "ivf_kmeans", "fmt": ANN_INDEX_FMT, "nlist": nlist,
             "nprobe": IVF_NPROBE, "source": sf_dir},
            fh,
        )
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_ann_ivf_kmeans_serve", sql=_IVFK_SQL)
def q_ann_ivf_kmeans_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving path of the trained-centroid IVF: load the persisted
    Lloyd centroids + cell assignments (build_ivf_kmeans_index),
    score the query batch against the broadcast centroid table
    (|Q| × nlist exact-integer distances), directory-prune to the
    nprobe probed cells, and rank candidates by the same exact
    integer squared-L2.  Shares the rebuild twin's oracle — the hash
    match certifies the index round trip through parquet, including
    the integerized vectors stored IN the assignments (serving never
    touches the fixture corpus except for the query batch read)."""
    import os

    path = build_ivf_kmeans_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    qv = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") <= KNN_QUERIES)
        .select(F.col("vec_id").alias("q_id"), _micro_arr("embedding").alias("qm"))
    )
    qd = qv.crossJoin(F.broadcast(cents)).select(
        "q_id", "qm", "cid", _int_sqdist(F.col("qm"), F.col("cm")).alias("sq")
    )
    wp = Window.partitionBy("q_id").orderBy("sq", "cid")
    # persist: the probe frame (|Q| x nprobe rows) feeds BOTH the
    # driver-side cell-pruning collect and the broadcast candidate
    # join — without it the query batch is re-scored against the
    # centroid table in a second job (ADVICE r8)
    probes = (
        qd.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= IVF_NPROBE)
        .select("q_id", "qm", F.col("cid").alias("cell"))
        .transform(scoped_persist)
    )
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    # pin the read schema: fmt 2 assignments carry a label column the
    # unfiltered serve never uses — old consumers pin what they read
    # (same rule q_bm25_serve follows for positions; ADVICE r9)
    assign = (
        spark.read.schema("vec_id bigint, vm array<bigint>, cell int")
        .parquet(os.path.join(path, "assignments"))
        .where(F.col("cell").isin(cells))
    )
    cand = assign.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        cand.select(
            "q_id", "vec_id", _int_sqdist(F.col("qm"), F.col("vm")).alias("sq")
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ------------------------------------------------ filtered ANN serving (r9)

_IVFK_FILTERED_SQL = f"""
    WITH vecs AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), seeds AS (
      SELECT vec_id AS cid, vm AS cm FROM vecs
      WHERE vec_id < (SELECT greatest({IVFK_NLIST}, count(*) // {TARGET_CELL})
                      FROM vecs)
    ), d0 AS (
      SELECT v.vec_id, s.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - s.cm[i]) * (v.vm[i] - s.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN seeds s
    ), a0 AS (
      SELECT vec_id, cid FROM d0
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), elems AS (
      SELECT a.cid, unnest(range(1, len(v.vm) + 1)) AS pos, unnest(v.vm) AS m
      FROM a0 a JOIN vecs v USING (vec_id)
    ), cmeans AS (
      SELECT cid, pos, CAST(sum(m) AS BIGINT) // count(*) AS nm
      FROM elems GROUP BY cid, pos
    ), cents AS (
      SELECT cid, list(nm ORDER BY pos) AS cm FROM cmeans GROUP BY cid
    ), d1 AS (
      SELECT v.vec_id, c.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - c.cm[i]) * (v.vm[i] - c.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN cents c
    ), assign AS (
      SELECT vec_id, cid AS cell FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), probes AS (
      SELECT vec_id AS q_id, cid AS cell FROM d1 WHERE vec_id <= {KNN_QUERIES}
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid)
              <= {IVFK_NPROBE_F}
    ), scored AS (
      SELECT p.q_id, q.label, a.vec_id,
             list_reduce(list_transform(range(1, len(q.vm) + 1),
                  i -> (q.vm[i] - t.vm[i]) * (q.vm[i] - t.vm[i])),
               (acc, x) -> acc + x) AS sq
      FROM probes p
      JOIN assign a ON a.cell = p.cell
      JOIN vecs q ON q.vec_id = p.q_id
      JOIN vecs t ON t.vec_id = a.vec_id
      WHERE a.vec_id <> p.q_id AND t.label = q.label
    )
    SELECT q_id, label, vec_id AS neighbor_id,
           CAST(sq AS BIGINT) AS sq_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, label, vec_id, sq,
             row_number() OVER (PARTITION BY q_id ORDER BY sq, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {KNN_K}
    """


def ivf_kmeans_filtered_topk(
    spark: SparkSession,
    sf_dir: str,
    nlist: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """Parameterized filtered (same-label) IVF top-k — q_ann_filtered
    with the probe width exposed so tools/ann_bits_probe.py can
    measure the predicate/nprobe recall interaction.  Defaults
    reproduce the registered key exactly (derived nlist = IVFK_NLIST
    at fixture scale)."""
    nlist = derived_nlist(spark, sf_dir) if nlist is None else nlist
    nprobe = IVFK_NPROBE_F if nprobe is None else nprobe
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", "label", _micro_arr("embedding").alias("vm"))
    cents = _ivfk_cents(vecs, nlist)
    assign = _assign_cells(vecs, cents, nlist, keep=("vm", "label"))
    qd = (
        vecs.where(F.col("vec_id") <= KNN_QUERIES)
        .crossJoin(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("vm").alias("qm"),
            "cid",
            _int_sqdist(F.col("vm"), F.col("cm")).alias("sq"),
        )
    )
    wp = Window.partitionBy("q_id").orderBy("sq", "cid")
    probes = (
        qd.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "q_label", "qm", F.col("cid").alias("cell"))
    )
    cand = assign.join(F.broadcast(probes), "cell").where(
        (F.col("vec_id") != F.col("q_id")) & (F.col("label") == F.col("q_label"))
    )
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        cand.select(
            "q_id", "label", "vec_id",
            _int_sqdist(F.col("qm"), F.col("vm")).alias("sq"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            "label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register("q_ann_filtered", sql=_IVFK_FILTERED_SQL)
def q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN: same-label top-k over the trained-centroid IVF —
    the "metadata predicate inside the index" query every production
    vector store serves (find neighbors WHERE label = q.label /
    tenant = X / source = Y), not post-filtering a generic top-k
    (which silently under-fills k when the filter is selective).
    The predicate is evaluated on the CANDIDATE SET — after cell
    probing, before re-rank — so k survivors are ranked from the
    full filtered candidate pool; the probe width is IVFK_NPROBE_F
    (> IVF_NPROBE) because a selective predicate thins each probed
    cell (the nprobe/recall interaction, measured in SCALE.md r10).
    Same zero-float-parity design as q_ann_ivf_kmeans: exact integer
    micro-unit vectors, int64 squared-L2 everywhere, integer-division
    centroid means — full hash oracle through training, probing,
    filtering and ranking."""
    return ivf_kmeans_filtered_topk(spark, sf_dir)


@register("q_ann_filtered_serve", sql=_IVFK_FILTERED_SQL)
def q_ann_filtered_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving path of filtered ANN: the label predicate runs INSIDE
    the persisted index scan — cells are directory-pruned to the
    nprobe probed ones (plan-asserted), then the label filter cuts
    the candidate stream BEFORE any distance is computed, so the
    re-rank pays only |filtered candidates| int64 distances.  The
    index carries the filter column in its cell-partitioned
    assignments (build_ivf_kmeans_index fmt 2) — serving never joins
    back to the corpus for metadata.  Shares the rebuild twin's
    oracle: the hash match certifies the label round trip through
    parquet alongside the vectors.  fmt 3 (r11) promotes the filter
    column INTO the partitioning — (cell, label)-sharded assignments
    — so the query batch's labels prune DIRECTORIES (plan-asserted
    two-level PartitionFilters) and a selective predicate's serve
    cost drops to |probed cells ∩ query labels| instead of scanning
    whole cells and filtering rows; at 100 TB this is the difference
    between reading nprobe/nlist of the corpus and nprobe/(nlist·L)
    of it.  A highly-selective predicate beyond the label sharding
    still wants nprobe raised (the measured ladder in SCALE.md
    r10)."""
    import os

    path = build_ivf_kmeans_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    qv = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") <= KNN_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            _micro_arr("embedding").alias("qm"),
        )
    )
    qd = qv.crossJoin(F.broadcast(cents)).select(
        "q_id", "q_label", "qm", "cid",
        _int_sqdist(F.col("qm"), F.col("cm")).alias("sq"),
    )
    wp = Window.partitionBy("q_id").orderBy("sq", "cid")
    # persist: feeds the driver-side cell-pruning collect AND the
    # broadcast candidate join (the q_ann_ivf_kmeans_serve rule)
    probes = (
        qd.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= IVFK_NPROBE_F)
        .select("q_id", "q_label", "qm", F.col("cid").alias("cell"))
        .transform(scoped_persist)
    )
    pruned = probes.select("cell", "q_label").distinct().collect()
    cells = sorted({r.cell for r in pruned})
    labels = sorted({r.q_label for r in pruned})
    # two-level directory pruning (fmt 3): probed cells AND the query
    # batch's labels — both partition columns, both scan-pushed
    assign = spark.read.parquet(os.path.join(path, "assignments")).where(
        F.col("cell").isin(cells) & F.col("label").isin(labels)
    )
    cand = assign.join(F.broadcast(probes), "cell").where(
        (F.col("vec_id") != F.col("q_id")) & (F.col("label") == F.col("q_label"))
    )
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        cand.select(
            "q_id", "label", "vec_id",
            _int_sqdist(F.col("qm"), F.col("vm")).alias("sq"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            "label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# Product-quantization parameters: 64-dim vectors → 4 subspaces of 16
# dims, 16 centroids per subspace (codebook = the 16 lowest vec_ids —
# a deterministic stand-in for a trained k-means codebook; the
# ENCODE/ADC machinery is what the operator demonstrates)
PQ_M = 4
PQ_DS = 16
PQ_K = 16
PQ_QUERY = 1
PQ_TOP = 10


_PQ_SQL = f"""
    WITH cb AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < {PQ_K}
    ), corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS evec FROM embeddings
    ), sub AS (
      SELECT c.vec_id, b.cid, m.m,
        CAST(floor(list_reduce(list_transform(range(m.m * {PQ_DS}, m.m * {PQ_DS} + {PQ_DS}),
               j -> (c.evec[j + 1] - b.cvec[j + 1]) * (c.evec[j + 1] - b.cvec[j + 1])),
             (a, x) -> a + x) * 1000000 + 0.5) AS BIGINT) AS dmicro
      FROM corpus c
      CROSS JOIN cb b
      CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ), codes AS (
      SELECT vec_id, m, cid, dmicro FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dmicro, cid) AS rn
        FROM sub
      ) WHERE rn = 1
    ), qtab AS (
      SELECT m, cid, dmicro AS qdmicro FROM sub WHERE vec_id = {PQ_QUERY}
    )
    SELECT c.vec_id,
           CAST(sum(q.qdmicro) AS BIGINT) AS adc_micro,
           string_agg(CAST(c.cid AS VARCHAR), '-' ORDER BY c.m) AS pq_code
    FROM codes c JOIN qtab q ON c.m = q.m AND c.cid = q.cid
    WHERE c.vec_id <> {PQ_QUERY}
    GROUP BY c.vec_id
    ORDER BY adc_micro, c.vec_id
    LIMIT {PQ_TOP}
    """


@register("q_ann_pq", sql=_PQ_SQL)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (IVF-PQ's compression half): encode
    every vector as 4 centroid codes (argmin L2 per 16-dim subspace
    against a 16-entry codebook), build the query's asymmetric-distance
    table (query-subvector → centroid distances), and rank the corpus
    by ADC — the table-lookup sum that replaces full-vector math at
    serve time.  At 100 TB the corpus travels as 4 bytes/vector of
    codes (not 256 bytes of floats) and scoring is a broadcast-join of
    a 64-entry table against the code column: no shuffle of vectors.

    Cross-engine exactness: subspace distances fold left-to-right in
    index order starting at 0.0 (IEEE-identical on both engines — no
    libm), then quantize to integer micro-units BEFORE the argmin; the
    argmin and the final top-10 both tie-break on ids, and the ADC sum
    is an INTEGER sum — so the oracle replays encode, table, and
    ranking bit-for-bit."""
    e = load(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", _as_double("embedding").alias("evec"))
    cb = F.broadcast(
        ev.where(F.col("vec_id") < PQ_K).select(
            F.col("vec_id").alias("cid"), F.col("evec").alias("cvec")
        )
    )

    sub = (
        ev.crossJoin(cb)
        .select(
            "vec_id",
            "cid",
            F.posexplode(F.array(*[_pq_dmicro(m) for m in range(PQ_M)])).alias("m", "dmicro"),
        )
    )
    # argmin per (vector, subspace) as min(struct) — a two-phase hash
    # aggregate with map-side partials, not a window (a window can't
    # partial-combine, and at 100 TB this agg runs over corpus×K rows)
    codes = (
        sub.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dmicro", "cid")).alias("mc"))
        .select("vec_id", "m", F.col("mc.cid").alias("cid"))
    )
    qtab = F.broadcast(
        sub.where(F.col("vec_id") == PQ_QUERY).select(
            "m", "cid", F.col("dmicro").alias("qdmicro")
        )
    )
    return (
        codes.where(F.col("vec_id") != PQ_QUERY)
        .join(qtab, ["m", "cid"])
        .groupBy("vec_id")
        .agg(
            F.sum("qdmicro").cast("long").alias("adc_micro"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "cid"))),
                    lambda s: s["cid"].cast("string"),
                ),
                "-",
            ).alias("pq_code"),
        )
        .orderBy(F.asc("adc_micro"), F.asc("vec_id"))
        .limit(PQ_TOP)
    )


def _pq_dmicro(m: int) -> Column:
    """Quantized subspace-m L2 distance between columns ``evec`` and
    ``cvec`` — the exact expression tree q_ann_pq encodes with (zero-
    seeded index-order fold, no libm; floor-to-micro BEFORE argmin), so
    index build and query-time table build are bit-identical."""
    d = F.aggregate(
        F.sequence(F.lit(m * PQ_DS), F.lit(m * PQ_DS + PQ_DS - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + (F.element_at(F.col("evec"), j + 1) - F.element_at(F.col("cvec"), j + 1))
        * (F.element_at(F.col("evec"), j + 1) - F.element_at(F.col("cvec"), j + 1)),
    )
    return F.floor(d * 1000000 + F.lit(0.5)).cast("long")


def build_pq_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Build the PQ index ONCE and persist it: the codebook (16
    centroid vectors) plus the corpus as 4 subspace codes per vector —
    the compressed representation that IS product quantization's point
    (4 small ints per vector instead of 64 floats; at 100 TB the code
    table is ~1.6% of the raw corpus and the only thing serving ever
    scans).  Same idempotent build-once contract as build_ivf_index."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "pq")
    meta = os.path.join(path, "_INDEX_META.json")
    if _index_is_current(meta, kind="pq") and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    e = load(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", _as_double("embedding").alias("evec"))
    cb = F.broadcast(
        ev.where(F.col("vec_id") < PQ_K).select(
            F.col("vec_id").alias("cid"), F.col("evec").alias("cvec")
        )
    )
    sub = ev.crossJoin(cb).select(
        "vec_id",
        "cid",
        F.posexplode(F.array(*[_pq_dmicro(m) for m in range(PQ_M)])).alias("m", "dmicro"),
    )
    codes = (
        sub.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dmicro", "cid")).alias("mc"))
        .select("vec_id", "m", F.col("mc.cid").alias("cid"))
    )
    ev.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("evec").alias("cvec")
    ).write.parquet(os.path.join(path, "codebook"))
    codes.write.parquet(os.path.join(path, "codes"))
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"kind": "pq", "fmt": ANN_INDEX_FMT, "m": PQ_M, "k": PQ_K,
             "source": sf_dir},
            fh,
        )
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_ann_pq_serve", sql=_PQ_SQL)
def q_ann_pq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN *serving* path: load the persisted codebook + code table
    (build_pq_index) instead of re-encoding the corpus per query.
    Query-time work is exactly what PQ promises at 100 TB: build the
    64-entry asymmetric-distance table from the query vector against
    the broadcast codebook (the identical _pq_dmicro expression tree,
    so ADT values are bit-equal to the encode-time distances), then
    one broadcast join of that table against the 4-ints-per-vector
    code column and an integer-sum ranking — the raw float corpus is
    never read.  Shares q_ann_pq's oracle: results are bit-identical,
    so the hash check certifies the code/codebook round trip through
    parquet."""
    import os

    path = build_pq_index(spark, sf_dir)
    cb = F.broadcast(spark.read.parquet(os.path.join(path, "codebook")))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    qv = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == PQ_QUERY)
        .select(_as_double("embedding").alias("evec"))
    )
    qtab = F.broadcast(
        qv.crossJoin(cb).select(
            F.posexplode(
                F.array(*[_pq_dmicro(m) for m in range(PQ_M)])
            ).alias("m", "qdmicro"),
            "cid",
        ).select("m", "cid", "qdmicro")
    )
    return (
        codes.where(F.col("vec_id") != PQ_QUERY)
        .join(qtab, ["m", "cid"])
        .groupBy("vec_id")
        .agg(
            F.sum("qdmicro").cast("long").alias("adc_micro"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "cid"))),
                    lambda s: s["cid"].cast("string"),
                ),
                "-",
            ).alias("pq_code"),
        )
        .orderBy(F.asc("adc_micro"), F.asc("vec_id"))
        .limit(PQ_TOP)
    )


# --------------------------------------------------- IVF-PQ composite (r10)
#
# The production memory-bound ANN layout: IVF narrows the search to
# nprobe cells, PQ compresses what is scanned inside them.  At 100 TB
# the serving tier holds ONLY the centroid table (nlist x d ints), the
# 16-entry codebook, and 4 small ints per vector partitioned by cell —
# a probe touches nprobe directories of codes and never reads a float
# vector.  Both halves reuse their proven-exact building blocks
# (trained integer Lloyd centroids from q_ann_ivf_kmeans; the
# _pq_dmicro micro-quantized subspace distances from q_ann_pq), so the
# composite keeps a FULL hash oracle: every ranking quantity is an
# int64 and the one float expression tree (_pq_dmicro) is written
# byte-identically on both engines.

# shared IVF CTE prefix (vecs .. probes) — reused by the raw-vector
# PQ chain below AND the residual-encoded chain (r11)
_IVF_CTES = f"""vecs AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS evec,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), seeds AS (
      SELECT vec_id AS cid, vm AS cm FROM vecs
      WHERE vec_id < (SELECT greatest({IVFK_NLIST}, count(*) // {TARGET_CELL})
                      FROM vecs)
    ), d0 AS (
      SELECT v.vec_id, s.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - s.cm[i]) * (v.vm[i] - s.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN seeds s
    ), a0 AS (
      SELECT vec_id, cid FROM d0
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), elems AS (
      SELECT a.cid, unnest(range(1, len(v.vm) + 1)) AS pos, unnest(v.vm) AS m
      FROM a0 a JOIN vecs v USING (vec_id)
    ), cmeans AS (
      SELECT cid, pos, CAST(sum(m) AS BIGINT) // count(*) AS nm
      FROM elems GROUP BY cid, pos
    ), cents AS (
      SELECT cid, list(nm ORDER BY pos) AS cm FROM cmeans GROUP BY cid
    ), d1 AS (
      SELECT v.vec_id, c.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - c.cm[i]) * (v.vm[i] - c.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN cents c
    ), assign AS (
      SELECT vec_id, cid AS cell FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), probes AS (
      SELECT vec_id AS q_id, cid AS cell FROM d1 WHERE vec_id <= {KNN_QUERIES}
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) <= {IVF_NPROBE}
    )"""

# raw-vector PQ chain (vecs .. adc) — _IVFPQ_SQL ranks the ADC sums
# directly; the refine twin widens to top-R then re-ranks exactly
_IVFPQ_CTES = f"""{_IVF_CTES}, cb AS (
      SELECT vec_id AS cid, evec AS cvec FROM vecs WHERE vec_id < {PQ_K}
    ), sub AS (
      SELECT v.vec_id, b.cid, m.m,
        CAST(floor(list_reduce(list_transform(range(m.m * {PQ_DS}, m.m * {PQ_DS} + {PQ_DS}),
               j -> (v.evec[j + 1] - b.cvec[j + 1]) * (v.evec[j + 1] - b.cvec[j + 1])),
             (a, x) -> a + x) * 1000000 + 0.5) AS BIGINT) AS dmicro
      FROM vecs v
      CROSS JOIN cb b
      CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ), codes AS (
      SELECT vec_id, m, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dmicro, cid) AS rn
        FROM sub
      ) WHERE rn = 1
    ), qtab AS (
      SELECT vec_id AS q_id, m, cid, dmicro AS qdmicro
      FROM sub WHERE vec_id <= {KNN_QUERIES}
    ), cand AS (
      SELECT p.q_id, c.vec_id, c.m, c.cid
      FROM probes p
      JOIN assign a ON a.cell = p.cell
      JOIN codes c ON c.vec_id = a.vec_id
      WHERE c.vec_id <> p.q_id
    ), adc AS (
      SELECT d.q_id, d.vec_id, CAST(sum(q.qdmicro) AS BIGINT) AS adc_micro
      FROM cand d
      JOIN qtab q ON q.q_id = d.q_id AND q.m = d.m AND q.cid = d.cid
      GROUP BY d.q_id, d.vec_id
    )"""

_IVFPQ_SQL = f"""
    WITH {_IVFPQ_CTES}
    SELECT q_id, vec_id AS neighbor_id, adc_micro, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, adc_micro,
             row_number() OVER (PARTITION BY q_id ORDER BY adc_micro, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {KNN_K}
    """


def _ivfpq_frames(spark: SparkSession, sf_dir: str, nlist: int | None = None):
    """Shared build derivation for the in-plan key and the index
    builder: (cents, codebook, codes) where ``codes`` carries the IVF
    cell of each vector alongside its PQ subspace codes — cell rides
    through the encode agg (F.first) so assignment and encoding never
    meet in a corpus-sized join."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    base = e.select(
        "vec_id",
        _as_double("embedding").alias("evec"),
        _micro_arr("embedding").alias("vm"),
    )
    nlist = nlist or derived_nlist(spark, sf_dir)
    cents = _ivfk_cents(base.select("vec_id", "vm"), nlist)
    cb = F.broadcast(
        base.where(F.col("vec_id") < PQ_K).select(
            F.col("vec_id").alias("cid"), F.col("evec").alias("cvec")
        )
    )
    # assign each vector its IVF cell (map-side min_by — one row per
    # vector crosses the shuffle; two-level router past
    # TWOLEVEL_MIN_NLIST), keeping evec for the PQ encode
    assign = _assign_cells(base, cents, nlist, keep=("evec",))
    sub = assign.crossJoin(cb).select(
        "vec_id",
        "cell",
        "cid",
        F.posexplode(F.array(*[_pq_dmicro(m) for m in range(PQ_M)])).alias(
            "m", "dmicro"
        ),
    )
    codes = (
        sub.groupBy("vec_id", "m")
        .agg(
            F.min(F.struct("dmicro", "cid")).alias("mc"),
            F.first("cell").alias("cell"),
        )
        .select("vec_id", "m", F.col("mc.cid").alias("cid"), "cell")
    )
    return cents, cb, codes


def _ivfpq_rank(codes: DataFrame, probes: DataFrame, qtab: DataFrame) -> DataFrame:
    """Probe-pruned ADC ranking shared by the in-plan key and the serve
    twin: candidates = codes in probed cells, scored by the integer
    asymmetric-distance sum against the broadcast query table."""
    cand = codes.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    adc = (
        cand.join(F.broadcast(qtab), ["q_id", "m", "cid"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qdmicro").cast("long").alias("adc_micro"))
    )
    wr = Window.partitionBy("q_id").orderBy("adc_micro", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_micro",
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register("q_ann_ivfpq", sql=_IVFPQ_SQL)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN (VERDICT r9 missing #1): trained-centroid
    IVF cells narrow the scan to nprobe cells per query; inside them
    candidates are ranked by the PQ asymmetric-distance sum (ADC) —
    the table-lookup integer sum over 4 codes per vector that replaces
    full-vector math.  The query batch (vec_id <= KNN_QUERIES, fixed
    size — never grows with the corpus) probes IVF_NPROBE cells each.

    Exactness: IVF half is the q_ann_ivf_kmeans integer pipeline
    (micro-unit vectors, exact int64 squared-L2, integer-division
    Lloyd round); PQ half is the q_ann_pq micro-quantized subspace
    fold (_pq_dmicro, byte-identical expression tree both engines);
    ADC is an integer sum with id tie-breaks — zero float parity
    surface, full hash oracle.

    Scale shape: one O(n·nlist) broadcast assign pass and one
    O(n·K·M) broadcast encode pass (both map-side-combinable aggs, one
    row per vector or per (vector, subspace) crosses each shuffle);
    serving is bounded by nprobe cells × 4 codes — see
    q_ann_ivfpq_serve for the persisted layout."""
    cents, cb, codes = _ivfpq_frames(spark, sf_dir)
    probes, qtab, _ = _ivfpq_query_frames(spark, sf_dir, cents, cb)
    return _ivfpq_rank(codes, probes, qtab)


def build_ivfpq_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Persist the IVF-PQ layout once (idempotent marker contract):
    ``centroids/`` (nlist trained integer Lloyd centroids),
    ``codebook/`` (16 raw centroid vectors for ADT construction), and
    ``codes/`` — 4 subspace codes per vector PARTITIONED BY IVF CELL,
    so a probe opens nprobe directories and scans ~nprobe/nlist of the
    compressed corpus.  This is the memory-bound production layout:
    at 100 TB the serving tier stores ~4 small ints per vector and
    never touches a float."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "ivfpq")
    meta = os.path.join(path, "_INDEX_META.json")
    if _index_is_current(meta, kind="ivfpq") and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    cents, cb, codes = _ivfpq_frames(spark, sf_dir)
    cents.write.parquet(os.path.join(path, "centroids"))
    cb.write.parquet(os.path.join(path, "codebook"))
    write_partitioned(codes, os.path.join(path, "codes"), "cell")
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"kind": "ivfpq", "fmt": ANN_INDEX_FMT,
             # the REAL (derived) cell count, not the floor constant —
             # at 64x this reads 512, matching the layout on disk (r14)
             "nlist": cents.count(),
             "nprobe": IVF_NPROBE, "m": PQ_M, "k": PQ_K, "source": sf_dir},
            fh,
        )
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_ann_ivfpq_serve", sql=_IVFPQ_SQL)
def q_ann_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ *serving* path: centroids + codebook load as two tiny
    broadcasts, the query batch is scored against the centroid table
    (|Q| × nlist integer distances), and the ADC scan reads ONLY the
    probed cells' code directories (partition-pruned; pinned read
    schema).  Shares the rebuild twin's oracle — the hash match
    certifies the codes/codebook/centroid round trip through parquet.
    Per-query serve cost is nprobe/nlist of the code table and is
    independent of corpus growth once nlist scales ≈ n / target_cell
    (the q_ann_ivf_kmeans knob, SCALE.md r8)."""
    import os

    path = build_ivfpq_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cb = F.broadcast(spark.read.parquet(os.path.join(path, "codebook")))
    probes, qtab, _ = _ivfpq_query_frames(spark, sf_dir, cents, cb)
    # persist: the probe frame feeds BOTH the driver-side cell-pruning
    # collect and the candidate join (the ADVICE-r8 rule the kmeans
    # serve follows)
    probes = scoped_persist(probes)
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    codes = (
        spark.read.schema("vec_id bigint, m int, cid bigint, cell bigint")
        .parquet(os.path.join(path, "codes"))
        .where(F.col("cell").isin(cells))
    )
    return _ivfpq_rank(codes, probes, qtab)


# ------------------------------------------- IVF-PQ refine + recall (r10)

# ADC candidates re-ranked exactly: the refine step fetches the RAW
# vectors for only top-R ids per query (a point lookup against primary
# storage), recovering the recall PQ's 4-code compression gives up.
IVFPQ_REFINE_R = 4 * KNN_K

_KNN_L2_SQL = f"""
    WITH vecs AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), qs AS (
      SELECT vec_id AS q_id, vm AS qm FROM vecs WHERE vec_id <= {KNN_QUERIES}
    ), scored AS (
      SELECT q.q_id, v.vec_id,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (q.qm[i] - v.vm[i]) * (q.qm[i] - v.vm[i])),
               (acc, x) -> acc + x) AS sq
      FROM qs q JOIN vecs v ON v.vec_id <> q.q_id
    )
    SELECT q_id, vec_id AS neighbor_id,
           CAST(sq AS BIGINT) AS sq_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, sq,
             row_number() OVER (PARTITION BY q_id ORDER BY sq, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {KNN_K}
    """


@register("q_knn_l2", sql=_KNN_L2_SQL)
def q_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer-L2 brute-force k-NN for the fixed query batch —
    the squared-L2 twin of q_knn_join (which ranks by cosine) and the
    ground truth every integer-distance ANN key in this module
    approximates.  Broadcast query side (|Q| is fixed — never grows
    with the corpus), one narrow scan of the vectors, map-side top-k
    via the rank window on the |Q|-keyed partitioning.  All-integer:
    full hash oracle."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", _micro_arr("embedding").alias("vm"))
    qv = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") <= KNN_QUERIES)
        .select(F.col("vec_id").alias("q_id"), _micro_arr("embedding").alias("qm"))
    )
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        vecs.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", _int_sqdist(F.col("qm"), F.col("vm")).alias("sq")
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


_IVFPQ_REFINE_SQL = f"""
    WITH {_IVFPQ_CTES}, cand_r AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY adc_micro, vec_id) AS rn
        FROM adc
      ) WHERE rn <= {IVFPQ_REFINE_R}
    ), refined AS (
      SELECT c.q_id, c.vec_id,
             list_reduce(list_transform(range(1, len(q.vm) + 1),
                  i -> (q.vm[i] - t.vm[i]) * (q.vm[i] - t.vm[i])),
               (acc, x) -> acc + x) AS sq
      FROM cand_r c
      JOIN vecs q ON q.vec_id = c.q_id
      JOIN vecs t ON t.vec_id = c.vec_id
    )
    SELECT q_id, vec_id AS neighbor_id,
           CAST(sq AS BIGINT) AS sq_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, sq,
             row_number() OVER (PARTITION BY q_id ORDER BY sq, vec_id) AS rn
      FROM refined
    ) WHERE rn <= {KNN_K}
    """


def _ivfpq_refine(
    spark: SparkSession, sf_dir: str, codes: DataFrame, probes: DataFrame,
    qtab: DataFrame, qv: DataFrame, r: int | None = None
) -> DataFrame:
    """ADC top-R -> exact re-rank shared by the in-plan refine key and
    its serve twin: the R-per-query candidate list broadcasts into the
    raw-vector scan (a point lookup at 100 TB — candidates are the
    ONLY full vectors ever read), then the exact integer squared-L2
    picks the final top-k."""
    cand = codes.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    adc = (
        cand.join(F.broadcast(qtab), ["q_id", "m", "cid"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qdmicro").cast("long").alias("adc_micro"))
    )
    wa = Window.partitionBy("q_id").orderBy("adc_micro", "vec_id")
    cand_r = (
        adc.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= (r or IVFPQ_REFINE_R))
        .select("q_id", "vec_id")
    )
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", _micro_arr("embedding").alias("vm")
    )
    ref = (
        vecs.join(F.broadcast(cand_r), "vec_id")
        .join(F.broadcast(qv.select("q_id", "qm")), "q_id")
        .select("q_id", "vec_id", _int_sqdist(F.col("qm"), F.col("vm")).alias("sq"))
    )
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        ref.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _ivfpq_query_frames(
    spark: SparkSession, sf_dir: str, cents: DataFrame, cb, nprobe: int | None = None
):
    """(probes, qtab, qv) for the fixed query batch against given IVF
    centroids + PQ codebook — shared by the ivfpq family."""
    e = load(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        _as_double("embedding").alias("evec"),
        _micro_arr("embedding").alias("qm"),
    )
    wp = Window.partitionBy("q_id").orderBy("sq", "cid")
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .select("q_id", "cid", _int_sqdist(F.col("qm"), F.col("cm")).alias("sq"))
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= (nprobe or IVF_NPROBE))
        .select("q_id", F.col("cid").alias("cell"))
    )
    qtab = qv.crossJoin(cb).select(
        "q_id",
        "cid",
        F.posexplode(F.array(*[_pq_dmicro(m) for m in range(PQ_M)])).alias(
            "m", "qdmicro"
        ),
    ).select("q_id", "m", "cid", "qdmicro")
    return probes, qtab, qv


def ivfpq_adc_topk(
    spark: SparkSession, sf_dir: str,
    nlist: int | None = None, nprobe: int | None = None,
) -> DataFrame:
    """Parameterized IVF-PQ ADC pipeline (q_ann_ivfpq with the nlist /
    nprobe deployment knobs exposed for tools/ann_bits_probe.py);
    defaults reproduce the registered key exactly."""
    cents, cb, codes = _ivfpq_frames(spark, sf_dir, nlist)
    probes, qtab, _ = _ivfpq_query_frames(spark, sf_dir, cents, cb, nprobe)
    return _ivfpq_rank(codes, probes, qtab)


def ivfpq_refine_topk(
    spark: SparkSession, sf_dir: str,
    nlist: int | None = None, nprobe: int | None = None,
    r: int | None = None,
) -> DataFrame:
    """Parameterized IVF-PQ + exact-refine pipeline (q_ann_ivfpq_refine
    with the knobs exposed); defaults reproduce the registered key.
    The refine width ``r`` is the recall knob that must SCALE with
    per-cell occupancy: at a 16-bit code budget the ADC ordering
    inside a cell is near-tie-dense, so a fixed r loses exactly the
    neighbors the probe coverage still allows — measured at 64x
    (SCALE.md r10): r=20 recalls 0.219, r=100 recalls 0.857, r=500
    hits the 0.8667 exact-in-probed-cells ceiling.  Rule: hold
    r / cell_occupancy at its base value (~= 20/250), the same
    base-occupancy re-parameterization as nlist and LSH bits."""
    cents, cb, codes = _ivfpq_frames(spark, sf_dir, nlist)
    probes, qtab, qv = _ivfpq_query_frames(spark, sf_dir, cents, cb, nprobe)
    return _ivfpq_refine(spark, sf_dir, codes, probes, qtab, qv, r)


@register("q_ann_ivfpq_refine", sql=_IVFPQ_REFINE_SQL)
def q_ann_ivfpq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-ranking: ADC ranks the probed cells'
    compressed codes, the top-R (R = 4k) candidates fetch their RAW
    vectors (broadcast-join point lookup — the only full-vector read
    in the query path), and the exact integer squared-L2 picks the
    final top-k.  This is the standard production refinement: PQ
    compression quantizes distances, so pure-ADC ranking swaps
    near-ties; re-ranking a small R recovers exact-metric ordering at
    R/corpus cost.  q_ann_ivfpq_recall measures exactly how much it
    recovers.  All-integer end to end: full hash oracle."""
    cents, cb, codes = _ivfpq_frames(spark, sf_dir)
    probes, qtab, qv = _ivfpq_query_frames(spark, sf_dir, cents, cb)
    return _ivfpq_refine(spark, sf_dir, codes, probes, qtab, qv)


@register("q_ann_ivfpq_refine_serve", sql=_IVFPQ_REFINE_SQL)
def q_ann_ivfpq_refine_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of the refine path: codes/codebook/centroids from
    the persisted IVF-PQ index (partition-pruned to the probed cells),
    refine vectors from primary storage filtered by the broadcast
    candidate list.  Shares the rebuild twin's oracle — the hash match
    certifies the full serve round trip including the refine lookup."""
    import os

    path = build_ivfpq_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cb = F.broadcast(spark.read.parquet(os.path.join(path, "codebook")))
    probes, qtab, qv = _ivfpq_query_frames(spark, sf_dir, cents, cb)
    probes = scoped_persist(probes)
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    codes = (
        spark.read.schema("vec_id bigint, m int, cid bigint, cell bigint")
        .parquet(os.path.join(path, "codes"))
        .where(F.col("cell").isin(cells))
    )
    return _ivfpq_refine(spark, sf_dir, codes, probes, qtab, qv)


_IVFPQ_RECALL_SQL = f"""
    WITH approx AS (
      SELECT q_id, neighbor_id FROM ({_IVFPQ_REFINE_SQL}) ra
    ), exact AS (
      SELECT q_id, neighbor_id FROM ({_KNN_L2_SQL}) re
    ), hits AS (
      SELECT e.q_id, count(a.neighbor_id) AS n_hits
      FROM exact e
      LEFT JOIN approx a ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.q_id
    )
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST((n_hits * 100) // {KNN_K} AS BIGINT) AS recall_pct
    FROM hits ORDER BY q_id
"""


@register("q_ann_ivfpq_recall", sql=_IVFPQ_RECALL_SQL)
def q_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the REFINED IVF-PQ pipeline against exact
    integer-L2 k-NN (q_knn_l2) — the acceptance gate for the
    composite layout, fully hash-oracled by composing the two
    registered twins as CTEs (the q_ann_recall pattern).  Both
    pipelines are deterministic integer ranks, so the recall integers
    are exact on both engines."""
    a = q_ann_ivfpq_refine.__wrapped__(spark, sf_dir).select(
        "q_id", "neighbor_id"
    ).withColumn("hit", F.lit(1))
    ex = q_knn_l2.__wrapped__(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        ex.join(a, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "q_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"CAST((n_hits * 100) div {KNN_K} AS BIGINT)").alias("recall_pct"),
        )
        .orderBy("q_id")
    )


def _pqt_dist_sql(a: str, b: str, d: int = PQ_DS) -> str:
    """Integer subspace squared-L2 as DuckDB SQL — shared by the
    trained-PQ chain (r10) and the residual IVF-PQ chain (r11)."""
    return (
        f"list_reduce(list_transform(range(1, {d} + 1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
    )


# ---------------------------------------- residual-encoded IVF-PQ (r11)
#
# Production IVF-PQ encodes RESIDUALS (vector - assigned cell
# centroid), not raw vectors: after the IVF assignment every vector in
# a cell is within a cell-radius of its centroid, so the PQ codebook
# only has to cover that small ball instead of the whole embedding
# space — this is where most of the recall at a small code budget
# comes from (VERDICT r10 missing #2: raw-vector ADC-only recall at
# 64x measured 0.086).  The integer pipeline extends exactly:
# residual = vm - cm is already exact int64, subspace distances are
# int64 squared-L2 over residual dims (NO float tree at all — the raw
# chain still needs _pq_dmicro's float fold; the residual chain is the
# first fully-integer PQ in the module), and the query-side ADT is
# built per PROBED CELL (the query's residual depends on which cell it
# probes — the defining asymmetry of residual IVF-PQ).

_IVFPQ_RES_CTES = f"""{_IVF_CTES}, res AS (
      SELECT a.vec_id, a.cell,
             list_transform(range(1, len(v.vm) + 1), i -> v.vm[i] - c.cm[i]) AS rv
      FROM assign a
      JOIN vecs v USING (vec_id)
      JOIN cents c ON c.cid = a.cell
    ), rsub AS (
      SELECT vec_id, cell, m.m,
             list_transform(range(m.m * {PQ_DS} + 1, m.m * {PQ_DS} + {PQ_DS} + 1),
               i -> rv[i]) AS sv
      FROM res CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ), rseeds AS (
      SELECT m, vec_id AS cid, sv AS cm FROM rsub WHERE vec_id < {PQ_K}
    ), ra0 AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, d.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {_pqt_dist_sql("s.sv", "d.cm")}, d.cid) AS rn
        FROM rsub s JOIN rseeds d ON d.m = s.m
      ) WHERE rn = 1
    ), relems AS (
      SELECT a.m, a.cid, unnest(range(1, {PQ_DS} + 1)) AS pos, unnest(s.sv) AS v
      FROM ra0 a JOIN rsub s ON s.vec_id = a.vec_id AND s.m = a.m
    ), rtmeans AS (
      SELECT m, cid, pos, CAST(sum(v) AS BIGINT) // count(*) AS nv
      FROM relems GROUP BY m, cid, pos
    ), rtcents AS (
      SELECT m, cid, list(nv ORDER BY pos) AS cm FROM rtmeans GROUP BY m, cid
    ), rcodes AS (
      SELECT vec_id, cell, m, cid FROM (
        SELECT s.vec_id, s.cell, s.m, t.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {_pqt_dist_sql("s.sv", "t.cm")}, t.cid) AS rn
        FROM rsub s JOIN rtcents t ON t.m = s.m
      ) WHERE rn = 1
    ), qres AS (
      SELECT p.q_id, p.cell,
             list_transform(range(1, len(v.vm) + 1), i -> v.vm[i] - c.cm[i]) AS rq
      FROM probes p
      JOIN vecs v ON v.vec_id = p.q_id
      JOIN cents c ON c.cid = p.cell
    ), qrsub AS (
      SELECT q_id, cell, m.m,
             list_transform(range(m.m * {PQ_DS} + 1, m.m * {PQ_DS} + {PQ_DS} + 1),
               i -> rq[i]) AS sv
      FROM qres CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ), rqtab AS (
      SELECT s.q_id, s.cell, s.m, t.cid,
             {_pqt_dist_sql("s.sv", "t.cm")} AS qdint
      FROM qrsub s JOIN rtcents t ON t.m = s.m
    ), radc AS (
      SELECT p.q_id, c.vec_id, CAST(sum(q.qdint) AS BIGINT) AS adc_micro2
      FROM probes p
      JOIN rcodes c ON c.cell = p.cell
      JOIN rqtab q ON q.q_id = p.q_id AND q.cell = c.cell
                  AND q.m = c.m AND q.cid = c.cid
      WHERE c.vec_id <> p.q_id
      GROUP BY p.q_id, c.vec_id
    )"""

_IVFPQ_RES_SQL = f"""
    WITH {_IVFPQ_RES_CTES}
    SELECT q_id, vec_id AS neighbor_id, adc_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, adc_micro2,
             row_number() OVER (PARTITION BY q_id ORDER BY adc_micro2, vec_id) AS rn
      FROM radc
    ) WHERE rn <= {KNN_K}
    """


def _res_subvectors(
    res: DataFrame, arr: str = "rv", m_sub: int = PQ_M
) -> DataFrame:
    """Slice a residual frame into per-subspace rows: (…keys…, m, sv).
    Keeps every non-array column of ``res``.  ``m_sub`` is the code-
    budget knob (more subspaces = more bits per vector); subspace
    width is derived so m_sub always tiles the full dimension."""
    ds = (PQ_M * PQ_DS) // m_sub
    keep = [c for c in res.columns if c != arr]
    return res.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice(F.col(arr), m * ds + 1, ds).alias("sv"),
                    )
                    for m in range(m_sub)
                ]
            )
        ).alias("s"),
    ).select(*keep, "s.m", "s.sv")


def _ivfpq_res_frames(
    spark: SparkSession, sf_dir: str, nlist: int | None = None,
    m_sub: int = PQ_M,
):
    """(cents, rtcents, codes) for the residual chain: trained integer
    IVF centroids; a TRAINED residual codebook — one exact-integer
    Lloyd round per subspace over residual subvectors, seeded by the
    PQ_K lowest vec_ids' residual subvectors (the _pqt_trained_cents
    machinery applied in residual space: integer headroom holds, a
    residual element is in ±4e6 so a subspace diff ≤ 8e6 → the
    16-dim fold ≤ 1.0e15, inside int64; negative sums divide
    identically on both engines — the r7s2 negative-numerator
    bridge); and per-vector subspace codes carrying the IVF cell."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    base = e.select("vec_id", _micro_arr("embedding").alias("vm"))
    # r14: nlist DERIVES like every other trained-IVF family (the
    # registered oracle's _IVF_CTES seed rule is already the derived
    # scalar subquery — the builder had stayed at the fixed floor, so
    # a 64× build trained 8 unbounded cells while its own oracle text
    # said n/250); at every fixture scale derived == IVFK_NLIST, so
    # parity history is unbroken.  The corpus assignment rides
    # _assign_cells (auto two-level past TWOLEVEL_MIN_NLIST — the
    # same routing _ivfpq_frames uses) instead of the hand-rolled
    # flat crossJoin, which at derived nlist would be the O(n·nlist)
    # single-exchange hazard every other family already left behind.
    nlist = nlist or derived_nlist(spark, sf_dir)
    cents = _ivfk_cents(base, nlist)
    assign = _assign_cells(base, cents, nlist, keep=("vm",)).select(
        "vec_id", "cell", "vm"
    )
    res = assign.join(
        F.broadcast(cents.select(F.col("cid").alias("cell"), "cm")), "cell"
    ).select("vec_id", "cell", F.zip_with("vm", "cm", lambda a, b: a - b).alias("rv"))
    rsub = _res_subvectors(res, m_sub=m_sub)
    rtcents = _pqt_trained_cents(rsub.select("vec_id", "m", "sv"))
    codes = (
        rsub.join(F.broadcast(rtcents), "m")
        .select(
            "vec_id", "cell", "m", "cid",
            _int_sqdist(F.col("sv"), F.col("cm")).alias("sq"),
        )
        .groupBy("vec_id", "m")
        .agg(
            F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cid"),
            F.first("cell").alias("cell"),
        )
    )
    return cents, rtcents, codes


def _ivfpq_res_query_frames(
    spark: SparkSession, sf_dir: str, cents: DataFrame, rtcents: DataFrame,
    nprobe: int | None = None, m_sub: int = PQ_M,
):
    """(probes, rqtab, qv) for the fixed query batch: probes carry the
    query's residual AGAINST EACH PROBED CELL (rq = qm - cm_cell —
    the defining asymmetry of residual IVF-PQ), and the ADT is
    |Q| x nprobe x M x K integer rows, broadcast; qv keeps the raw
    micro-unit query vectors for the refine twin."""
    qv = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") <= KNN_QUERIES)
        .select(F.col("vec_id").alias("q_id"), _micro_arr("embedding").alias("qm"))
    )
    wp = Window.partitionBy("q_id").orderBy("sq", "cid")
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .select(
            "q_id", "qm", "cid", "cm",
            _int_sqdist(F.col("qm"), F.col("cm")).alias("sq"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= (nprobe or IVF_NPROBE))
        .select(
            "q_id",
            F.col("cid").alias("cell"),
            F.zip_with("qm", "cm", lambda a, b: a - b).alias("rq"),
        )
    )
    rqtab = (
        _res_subvectors(probes, "rq", m_sub=m_sub)
        .join(F.broadcast(rtcents), "m")
        .select(
            "q_id", "cell", "m", "cid",
            _int_sqdist(F.col("sv"), F.col("cm")).alias("qdint"),
        )
    )
    return probes, rqtab, qv


def _ivfpq_res_adc(codes: DataFrame, probes: DataFrame, rqtab: DataFrame) -> DataFrame:
    """Probe-pruned residual-ADC scores (q_id, vec_id, adc_micro2):
    candidates = codes in probed cells, scored by the per-cell integer
    ADT sum — shared by the rank and refine tails."""
    cand = codes.join(F.broadcast(probes.select("q_id", "cell")), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    return (
        cand.join(F.broadcast(rqtab), ["q_id", "cell", "m", "cid"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qdint").cast("long").alias("adc_micro2"))
    )


def _ivfpq_res_rank(codes: DataFrame, probes: DataFrame, rqtab: DataFrame) -> DataFrame:
    """Residual-ADC top-k ranking."""
    adc = _ivfpq_res_adc(codes, probes, rqtab)
    wr = Window.partitionBy("q_id").orderBy("adc_micro2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_micro2",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _ivfpq_res_refine(
    spark: SparkSession, sf_dir: str, codes: DataFrame, probes: DataFrame,
    rqtab: DataFrame, qv: DataFrame, r: int | None = None,
) -> DataFrame:
    """Residual-ADC top-R -> exact integer re-rank (the _ivfpq_refine
    tail on residual candidates): the R-per-query candidate list
    broadcasts into the raw-vector scan (point lookup at 100 TB),
    then exact int64 squared-L2 picks the final top-k."""
    adc = _ivfpq_res_adc(codes, probes, rqtab)
    wa = Window.partitionBy("q_id").orderBy("adc_micro2", "vec_id")
    cand_r = (
        adc.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= (r or IVFPQ_REFINE_R))
        .select("q_id", "vec_id")
    )
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", _micro_arr("embedding").alias("vm")
    )
    ref = (
        vecs.join(F.broadcast(cand_r), "vec_id")
        .join(F.broadcast(qv.select("q_id", "qm")), "q_id")
        .select("q_id", "vec_id", _int_sqdist(F.col("qm"), F.col("vm")).alias("sq"))
    )
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        ref.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfpq_res_adc_topk(
    spark: SparkSession, sf_dir: str,
    nlist: int | None = None, nprobe: int | None = None,
    m_sub: int = PQ_M,
) -> DataFrame:
    """Parameterized residual-ADC pipeline (q_ann_ivfpq_res with the
    nlist / nprobe / code-budget knobs exposed for
    tools/ann_bits_probe.py); defaults reproduce the registered key
    exactly.  ``m_sub`` raises the code budget (m_sub * log2(K) bits
    per vector) — the production knob when cell occupancy grows and
    ADC ordering inside a cell goes near-tie-dense."""
    cents, rtcents, codes = _ivfpq_res_frames(spark, sf_dir, nlist, m_sub=m_sub)
    probes, rqtab, _ = _ivfpq_res_query_frames(
        spark, sf_dir, cents, rtcents, nprobe, m_sub=m_sub
    )
    return _ivfpq_res_rank(codes, probes, rqtab)


@register("q_ann_ivfpq_res", sql=_IVFPQ_RES_SQL)
def q_ann_ivfpq_res(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVF-PQ (VERDICT r10 missing #2): identical IVF
    half to q_ann_ivfpq (trained integer Lloyd centroids, nprobe cell
    pruning), but the PQ half encodes RESIDUALS (vm - cell centroid)
    against a TRAINED residual codebook — one exact-integer Lloyd
    round per subspace over residual subvectors — and the query ADT
    is built per probed cell from the query's residual w.r.t. THAT
    cell.  Fully integer end to end — unlike the raw chain there is
    no float subspace fold anywhere — so the whole pipeline (through
    BOTH training rounds, IVF and PQ) carries a full hash oracle.

    Why residuals: after assignment every vector sits within a
    cell-radius of its centroid, so the codebook must only cover that
    ball, not the whole space — at the same 16-bit/vector code budget
    this is where production recall comes from (q_ann_ivfpq_res_recall
    and the ann_bits_probe residual rows quantify it against the
    raw-vector 0.086 ADC-only floor).

    Scale shape: one O(n*nlist) broadcast assign pass, one broadcast
    join to attach centroids, training + encode as two O(n*K)
    broadcast passes per subspace on one (vec, m)-keyed frame — one
    row per vector or (vector, subspace) across each shuffle; serving
    is nprobe cells x M codes per vector with a |Q|*nprobe*M*K
    broadcast ADT."""
    cents, rtcents, codes = _ivfpq_res_frames(spark, sf_dir)
    probes, rqtab, _ = _ivfpq_res_query_frames(spark, sf_dir, cents, rtcents)
    return _ivfpq_res_rank(codes, probes, rqtab)


def build_ivfpq_res_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Persist the residual IVF-PQ layout (idempotent marker contract):
    ``centroids/`` (IVF), ``rcodebook/`` (the TRAINED residual
    codebook — M*K rows of PQ_DS integers), ``codes/`` partitioned by
    cell — same memory-bound posture as build_ivfpq_index, 4 small
    ints per vector at serve time."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "ivfpq_res")
    meta = os.path.join(path, "_INDEX_META.json")
    if _index_is_current(meta, kind="ivfpq_res") and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    cents, rtcents, codes = _ivfpq_res_frames(spark, sf_dir)
    cents.write.parquet(os.path.join(path, "centroids"))
    rtcents.write.parquet(os.path.join(path, "rcodebook"))
    write_partitioned(codes, os.path.join(path, "codes"), "cell")
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"kind": "ivfpq_res", "fmt": ANN_INDEX_FMT,
             "nlist": cents.count(),  # derived (r14), not the floor
             "nprobe": IVF_NPROBE, "m": PQ_M, "k": PQ_K, "source": sf_dir},
            fh,
        )
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_ann_ivfpq_res_serve", sql=_IVFPQ_RES_SQL)
def q_ann_ivfpq_res_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of the residual chain: centroids + residual
    codebook load as tiny broadcasts, the ADC scan reads ONLY the
    probed cells' code directories (partition-pruned, pinned read
    schema).  Shares the rebuild twin's oracle — the hash match
    certifies the codes/rcodebook/centroid parquet round trip."""
    import os

    path = build_ivfpq_res_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    rtcents = spark.read.schema("m int, cid bigint, cm array<bigint>").parquet(
        os.path.join(path, "rcodebook")
    )
    probes, rqtab, _ = _ivfpq_res_query_frames(spark, sf_dir, cents, rtcents)
    probes = scoped_persist(probes)
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    codes = (
        spark.read.schema("vec_id bigint, m int, cid bigint, cell bigint")
        .parquet(os.path.join(path, "codes"))
        .where(F.col("cell").isin(cells))
    )
    return _ivfpq_res_rank(codes, probes, rqtab)


_IVFPQ_RES_REFINE_SQL = f"""
    WITH {_IVFPQ_RES_CTES}, cand_r AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY adc_micro2, vec_id) AS rn
        FROM radc
      ) WHERE rn <= {IVFPQ_REFINE_R}
    ), refined AS (
      SELECT c.q_id, c.vec_id,
             list_reduce(list_transform(range(1, len(q.vm) + 1),
                  i -> (q.vm[i] - t.vm[i]) * (q.vm[i] - t.vm[i])),
               (acc, x) -> acc + x) AS sq
      FROM cand_r c
      JOIN vecs q ON q.vec_id = c.q_id
      JOIN vecs t ON t.vec_id = c.vec_id
    )
    SELECT q_id, vec_id AS neighbor_id,
           CAST(sq AS BIGINT) AS sq_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, sq,
             row_number() OVER (PARTITION BY q_id ORDER BY sq, vec_id) AS rn
      FROM refined
    ) WHERE rn <= {KNN_K}
    """


def ivfpq_res_refine_topk(
    spark: SparkSession, sf_dir: str,
    nlist: int | None = None, nprobe: int | None = None,
    r: int | None = None, m_sub: int = PQ_M,
) -> DataFrame:
    """Parameterized residual IVF-PQ + exact-refine pipeline (knobs
    exposed for tools/ann_bits_probe.py); defaults reproduce
    q_ann_ivfpq_res_refine exactly."""
    cents, rtcents, codes = _ivfpq_res_frames(spark, sf_dir, nlist, m_sub=m_sub)
    probes, rqtab, qv = _ivfpq_res_query_frames(
        spark, sf_dir, cents, rtcents, nprobe, m_sub=m_sub
    )
    return _ivfpq_res_refine(spark, sf_dir, codes, probes, rqtab, qv, r)


@register("q_ann_ivfpq_res_refine", sql=_IVFPQ_RES_REFINE_SQL)
def q_ann_ivfpq_res_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ with exact re-ranking — the deployment shape of
    the residual chain, and where residual encoding's candidate
    quality pays off measurably: at 64x with the SAME refine width
    (r=20) and nlist=8, raw-vector candidates recall 0.219 while
    residual candidates recall 0.267 (m_sub=4) / 0.295 (m_sub=16) —
    better than raw even after scaling nlist to 512 at 7x the build
    cost (0.257); see SCALE.md r11.  All-integer end to end: full
    hash oracle through both training rounds and the refine."""
    cents, rtcents, codes = _ivfpq_res_frames(spark, sf_dir)
    probes, rqtab, qv = _ivfpq_res_query_frames(spark, sf_dir, cents, rtcents)
    return _ivfpq_res_refine(spark, sf_dir, codes, probes, rqtab, qv)


@register("q_ann_ivfpq_res_refine_serve", sql=_IVFPQ_RES_REFINE_SQL)
def q_ann_ivfpq_res_refine_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of the residual refine path: codes/rcodebook/
    centroids from the persisted index (partition-pruned to probed
    cells, pinned read schemas), refine vectors from primary storage
    filtered by the broadcast candidate list.  Shares the rebuild
    twin's oracle."""
    import os

    path = build_ivfpq_res_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    rtcents = spark.read.schema("m int, cid bigint, cm array<bigint>").parquet(
        os.path.join(path, "rcodebook")
    )
    probes, rqtab, qv = _ivfpq_res_query_frames(spark, sf_dir, cents, rtcents)
    probes = scoped_persist(probes)
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    codes = (
        spark.read.schema("vec_id bigint, m int, cid bigint, cell bigint")
        .parquet(os.path.join(path, "codes"))
        .where(F.col("cell").isin(cells))
    )
    return _ivfpq_res_refine(spark, sf_dir, codes, probes, rqtab, qv)


_IVFPQ_RES_RECALL_SQL = f"""
    WITH approx AS (
      SELECT q_id, neighbor_id FROM ({_IVFPQ_RES_SQL}) ra
    ), exact AS (
      SELECT q_id, neighbor_id FROM ({_KNN_L2_SQL}) re
    ), hits AS (
      SELECT e.q_id, count(a.neighbor_id) AS n_hits
      FROM exact e
      LEFT JOIN approx a ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.q_id
    )
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST((n_hits * 100) // {KNN_K} AS BIGINT) AS recall_pct
    FROM hits ORDER BY q_id
"""


@register("q_ann_ivfpq_res_recall", sql=_IVFPQ_RES_RECALL_SQL)
def q_ann_ivfpq_res_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of residual ADC-ONLY ranking (no exact refine) against
    exact integer-L2 k-NN — deliberately excludes the refine rescue so
    the number isolates what the ENCODING buys: compare directly with
    the raw-vector chain's ADC-only row (0.086 at 64x, SCALE.md r10).
    Fully hash-oracled by composing the two registered twins as CTEs
    (the q_ann_recall pattern)."""
    a = q_ann_ivfpq_res.__wrapped__(spark, sf_dir).select(
        "q_id", "neighbor_id"
    ).withColumn("hit", F.lit(1))
    ex = q_knn_l2.__wrapped__(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        ex.join(a, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "q_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"CAST((n_hits * 100) div {KNN_K} AS BIGINT)").alias("recall_pct"),
        )
        .orderBy("q_id")
    )


# ------------------------------------------- trained-codebook PQ (r10)
#
# q_ann_pq quantizes against an UNtrained codebook (the first K raw
# vectors) — honest about the algebra but not the deployment: real PQ
# trains each subspace's codebook with k-means.  This key does for PQ
# what q_ann_ivf_kmeans did for IVF: one exact-integer Lloyd round PER
# SUBSPACE from deterministic seeds, then encode + ADC-rank the query
# batch against the trained codebooks.  All-integer (micro-unit
# subvectors, int64 squared-L2, integer-division centroid means) →
# full hash oracle through the training round; q_ann_pq_trained_recall
# composes it against the exact-L2 twin.

# (_pqt_dist_sql is defined above the residual IVF-PQ section, which
# also uses it)

_PQT_SQL = f"""
    WITH vecs AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), sub AS (
      SELECT vec_id, m.m,
             list_transform(range(m.m * {PQ_DS} + 1, m.m * {PQ_DS} + {PQ_DS} + 1),
               i -> vm[i]) AS sv
      FROM vecs CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ), seeds AS (
      SELECT m, vec_id AS cid, sv AS cm FROM sub WHERE vec_id < {PQ_K}
    ), a0 AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, d.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {_pqt_dist_sql("s.sv", "d.cm")}, d.cid) AS rn
        FROM sub s JOIN seeds d ON d.m = s.m
      ) WHERE rn = 1
    ), elems AS (
      SELECT a.m, a.cid, unnest(range(1, {PQ_DS} + 1)) AS pos, unnest(s.sv) AS v
      FROM a0 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m
    ), tmeans AS (
      SELECT m, cid, pos, CAST(sum(v) AS BIGINT) // count(*) AS nv
      FROM elems GROUP BY m, cid, pos
    ), tcents AS (
      SELECT m, cid, list(nv ORDER BY pos) AS cm FROM tmeans GROUP BY m, cid
    ), codes AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, t.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {_pqt_dist_sql("s.sv", "t.cm")}, t.cid) AS rn
        FROM sub s JOIN tcents t ON t.m = s.m
      ) WHERE rn = 1
    ), qtab AS (
      SELECT s.vec_id AS q_id, s.m, t.cid,
             {_pqt_dist_sql("s.sv", "t.cm")} AS qd
      FROM sub s JOIN tcents t ON t.m = s.m
      WHERE s.vec_id <= {KNN_QUERIES}
    ), adc AS (
      SELECT q.q_id, c.vec_id, CAST(sum(q.qd) AS BIGINT) AS adc_micro2
      FROM codes c
      JOIN qtab q ON q.m = c.m AND q.cid = c.cid
      WHERE c.vec_id <> q.q_id
      GROUP BY q.q_id, c.vec_id
    )
    SELECT q_id, vec_id AS neighbor_id, adc_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, adc_micro2,
             row_number() OVER (PARTITION BY q_id ORDER BY adc_micro2, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {KNN_K}
    """


def _pqt_sub_frame(
    spark: SparkSession, sf_dir: str, queries_only: bool = False
) -> DataFrame:
    """(vec_id, m, sv): micro-unit subvectors, one row per (vector,
    subspace) — the frame every trained-PQ stage runs over."""
    e = load(spark, sf_dir, "embeddings", spread=not queries_only)
    if queries_only:
        e = e.where(F.col("vec_id") <= KNN_QUERIES)
    vecs = e.select("vec_id", _micro_arr("embedding").alias("vm"))
    return vecs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice(F.col("vm"), m * PQ_DS + 1, PQ_DS).alias("sv"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.m", "s.sv")


def _pqt_trained_cents(sub: DataFrame) -> DataFrame:
    """One exact-integer Lloyd round per subspace from deterministic
    seeds (the K lowest vec_ids' subvectors) -> (m, cid, cm)."""
    seeds = sub.where(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("cm")
    )
    a0 = (
        sub.join(F.broadcast(seeds), "m")
        .select(
            "vec_id", "m", "sv", "cid",
            _int_sqdist(F.col("sv"), F.col("cm")).alias("sq"),
        )
        .groupBy("vec_id", "m")
        .agg(
            F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cid"),
            F.first("sv").alias("sv"),
        )
    )
    return (
        a0.select("m", "cid", F.posexplode("sv").alias("pos", "v"))
        .groupBy("m", "cid", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("m", "cid", "pos", F.expr("s div n").alias("nv"))
        .groupBy("m", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "nv"))), lambda x: x["nv"]
            ).alias("cm")
        )
        # K*M rows of d integers embedding a full Lloyd pass — the
        # expensive-to-rebuild / cheap-to-store persist profile
        .transform(scoped_persist)
    )


def _pqt_encode(sub: DataFrame, tcents: DataFrame) -> DataFrame:
    """(vec_id, m, cid): argmin trained-centroid code per subspace."""
    return (
        sub.join(F.broadcast(tcents), "m")
        .select(
            "vec_id", "m", "cid",
            _int_sqdist(F.col("sv"), F.col("cm")).alias("sq"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cid"))
    )


@register("q_ann_pq_trained", sql=_PQT_SQL)
def q_ann_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with TRAINED per-subspace codebooks: deterministic seeds (the
    K lowest vec_ids' subvectors) refined by one exact-integer Lloyd
    round per subspace, then the standard encode → ADC ranking of the
    query batch.  Zero float parity surface — subvectors are micro-unit
    integers, every distance (training, encode, ADT) is an exact int64
    squared-L2, centroid means are integer divisions — so the oracle
    hash-matches THROUGH the training round (the q_ann_ivf_kmeans
    contract, applied to PQ's codebooks).

    Scale shape: training + encode are two O(n·K) broadcast passes per
    subspace expressed as ONE frame keyed by (vec, m) — map-side
    min_by aggs, one row per (vector, subspace) across each shuffle;
    the trained codebook table is K·M rows of d integers (tiny,
    broadcast everywhere).  q_ann_pq_trained_serve answers from the
    persisted codebooks + codes without re-training."""
    sub = _pqt_sub_frame(spark, sf_dir)
    tcents = _pqt_trained_cents(sub)
    codes = _pqt_encode(sub, tcents)
    qtab = (
        sub.where(F.col("vec_id") <= KNN_QUERIES)
        .join(F.broadcast(tcents), "m")
        .select(
            F.col("vec_id").alias("q_id"), "m", "cid",
            _int_sqdist(F.col("sv"), F.col("cm")).alias("qd"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy("adc_micro2", "vec_id")
    return (
        codes.join(F.broadcast(qtab), ["m", "cid"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qd").cast("long").alias("adc_micro2"))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_micro2",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def build_pq_trained_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Persist the trained-PQ artifacts once: ``codebooks/`` (K x M
    trained integer subspace centroids) and ``codes/`` (M rows of
    (vec_id, m, cid) per vector) — the deployable form of
    q_ann_pq_trained, same idempotent marker contract as the other
    index builders."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "pq_trained")
    meta = os.path.join(path, "_INDEX_META.json")
    if _index_is_current(meta, kind="pq_trained") and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    sub = _pqt_sub_frame(spark, sf_dir)
    tcents = _pqt_trained_cents(sub)
    codes = _pqt_encode(sub, tcents)
    tcents.write.parquet(os.path.join(path, "codebooks"))
    codes.write.parquet(os.path.join(path, "codes"))
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"kind": "pq_trained", "fmt": ANN_INDEX_FMT, "m": PQ_M, "k": PQ_K,
             "source": sf_dir},
            fh,
        )
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_ann_pq_trained_serve", sql=_PQT_SQL)
def q_ann_pq_trained_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of q_ann_pq_trained: trained codebooks + code
    table load from the persisted index (the corpus is never
    re-encoded, never re-trained); query-time work is the |Q| x K x M
    integer ADT against the broadcast codebooks plus one broadcast
    join over the code column.  Shares the rebuild twin's oracle —
    the hash match certifies the trained-codebook round trip through
    parquet."""
    import os

    path = build_pq_trained_index(spark, sf_dir)
    tcents = F.broadcast(spark.read.parquet(os.path.join(path, "codebooks")))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    qsub = _pqt_sub_frame(spark, sf_dir, queries_only=True)
    qtab = (
        qsub.join(tcents, "m")
        .select(
            F.col("vec_id").alias("q_id"), "m", "cid",
            _int_sqdist(F.col("sv"), F.col("cm")).alias("qd"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy("adc_micro2", "vec_id")
    return (
        codes.join(F.broadcast(qtab), ["m", "cid"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qd").cast("long").alias("adc_micro2"))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_micro2",
            F.col("rank").cast("long").alias("rank"),
        )
    )


_PQT_RECALL_SQL = f"""
    WITH approx AS (
      SELECT q_id, neighbor_id FROM ({_PQT_SQL}) ta
    ), exact AS (
      SELECT q_id, neighbor_id FROM ({_KNN_L2_SQL}) te
    ), hits AS (
      SELECT e.q_id, count(a.neighbor_id) AS n_hits
      FROM exact e
      LEFT JOIN approx a ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.q_id
    )
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST((n_hits * 100) // {KNN_K} AS BIGINT) AS recall_pct
    FROM hits ORDER BY q_id
"""


@register("q_ann_pq_trained_recall", sql=_PQT_RECALL_SQL)
def q_ann_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of trained-codebook PQ's flat ADC ranking against
    exact integer-L2 k-NN — the composed-oracle acceptance gate (the
    q_ann_recall pattern) for the trained quantizer."""
    a = q_ann_pq_trained.__wrapped__(spark, sf_dir).select(
        "q_id", "neighbor_id"
    ).withColumn("hit", F.lit(1))
    ex = q_knn_l2.__wrapped__(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        ex.join(a, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "q_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"CAST((n_hits * 100) div {KNN_K} AS BIGINT)").alias("recall_pct"),
        )
        .orderBy("q_id")
    )


# --------------------------------- generational IVF (vector ingest, r10)
#
# The ANN analog of r9's text-index append: a daily vector ingest must
# join the index WITHOUT retraining centroids or rewriting the base
# assignments.  Standard IVF practice: centroids are FROZEN at train
# time (here: trained on the base split), new vectors are assigned to
# the frozen cells and appended as a new generation directory; serving
# reads the probed cells from every generation.  Retraining is a
# separate offline event that bumps the index format.
#
# Split convention: base = vec_id % 10 != 0, delta = vec_id % 10 == 0
# (the q_dedup_incremental / text-append ingest split).  Seeds are the
# nlist lowest BASE vec_ids — ids 1..8 (0 is delta), a fixed literal
# on both engines.

_IVFA_SQL = f"""
    WITH vecs AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), base AS (
      SELECT * FROM vecs WHERE vec_id % 10 <> 0
    ), seeds AS (
      SELECT vec_id AS cid, vm AS cm FROM base
      WHERE vec_id BETWEEN 1 AND {IVFK_NLIST}
    ), d0 AS (
      SELECT v.vec_id, s.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - s.cm[i]) * (v.vm[i] - s.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM base v CROSS JOIN seeds s
    ), a0 AS (
      SELECT vec_id, cid FROM d0
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), elems AS (
      SELECT a.cid, unnest(range(1, len(v.vm) + 1)) AS pos, unnest(v.vm) AS m
      FROM a0 a JOIN base v USING (vec_id)
    ), cmeans AS (
      SELECT cid, pos, CAST(sum(m) AS BIGINT) // count(*) AS nm
      FROM elems GROUP BY cid, pos
    ), cents AS (
      SELECT cid, list(nm ORDER BY pos) AS cm FROM cmeans GROUP BY cid
    ), d1 AS (
      SELECT v.vec_id, c.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - c.cm[i]) * (v.vm[i] - c.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN cents c
    ), assign AS (
      SELECT vec_id, cid AS cell FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), probes AS (
      SELECT vec_id AS q_id, cid AS cell FROM d1 WHERE vec_id <= {KNN_QUERIES}
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) <= {IVF_NPROBE}
    ), scored AS (
      SELECT p.q_id, a.vec_id,
             list_reduce(list_transform(range(1, len(q.vm) + 1),
                  i -> (q.vm[i] - t.vm[i]) * (q.vm[i] - t.vm[i])),
               (acc, x) -> acc + x) AS sq
      FROM probes p
      JOIN assign a ON a.cell = p.cell
      JOIN vecs q ON q.vec_id = p.q_id
      JOIN vecs t ON t.vec_id = a.vec_id
      WHERE a.vec_id <> p.q_id
    )
    SELECT q_id, vec_id AS neighbor_id,
           CAST(sq AS BIGINT) AS sq_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, sq,
             row_number() OVER (PARTITION BY q_id ORDER BY sq, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {KNN_K}
    """


def _ivfa_cents(vecs_base: DataFrame, seeds: DataFrame | None = None) -> DataFrame:
    """Frozen centroids for the generational index: one exact-integer
    Lloyd round over the BASE split, seeded by base vec_ids 1..nlist
    (0 is in the delta split).  Callers whose input has no guaranteed
    id range (the streaming first batch — file listing order is not
    contractual) pass their own (cid, cm) seed frame instead; absolute
    id seeding there silently trains an EMPTY centroid table and every
    later assign emits zero rows (ADVICE r10)."""
    if seeds is None:
        seeds = vecs_base.where(
            F.col("vec_id").between(1, IVFK_NLIST)
        ).select(F.col("vec_id").alias("cid"), F.col("vm").alias("cm"))
    a0 = (
        vecs_base.crossJoin(F.broadcast(seeds))
        .select("vec_id", "vm", "cid", _int_sqdist(F.col("vm"), F.col("cm")).alias("sq"))
        .groupBy("vec_id")
        .agg(
            F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cid"),
            F.first("vm").alias("vm"),
        )
    )
    return scoped_persist(
        a0.select("cid", F.posexplode("vm").alias("pos", "m"))
        .groupBy("cid", "pos")
        .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("cid", "pos", F.expr("s div n").alias("nm"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "nm"))), lambda s: s["nm"]
            ).alias("cm")
        )
    )


def _ivfa_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell, vm) against FROZEN centroids — map-side min_by,
    one row per vector across the shuffle."""
    return (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "vm", "cid", _int_sqdist(F.col("vm"), F.col("cm")).alias("sq"))
        .groupBy("vec_id")
        .agg(
            F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cell"),
            F.first("vm").alias("vm"),
        )
    )


def build_ivf_append_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Two-GENERATION IVF index: gen 0 holds the base corpus' cell
    assignments under centroids trained on the base alone; the delta
    batch is assigned to the SAME frozen centroids and appended as
    ``assignments/gen=1`` without touching gen 0 — only the delta is
    ever scored against the centroid table, which is how a 100 TB
    vector lake absorbs a daily ingest.

    Crash safety (the text-append marker contract): the delta's
    assignments are staged then atomically renamed; the meta marker —
    which alone advertises ``gens: 2`` — is replaced LAST, and a retry
    wipes any unadvertised gen=1/staging dir before redoing the
    append, so appends are idempotent and readers never see a
    half-appended generation."""
    import json
    import os
    import shutil
    import uuid

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "ivf_append")
    meta_path = os.path.join(path, "_INDEX_META.json")
    meta = None
    try:
        with open(meta_path) as fh:
            meta = json.load(fh)
        if (
            meta.get("fmt") != ANN_INDEX_FMT
            or meta.get("kind") != "ivf_append"
            or meta.get("source") != sf_dir
        ):
            meta = None
    except (OSError, ValueError):
        meta = None
    if force:
        meta = None
    if meta is not None and meta.get("gens") == 2:
        return path

    if meta is None:
        # ---- base build (gen 0): train + assign the standing corpus
        shutil.rmtree(path, ignore_errors=True)
        e = load(spark, sf_dir, "embeddings", spread=True)
        base = e.where(F.col("vec_id") % 10 != 0).select(
            "vec_id", _micro_arr("embedding").alias("vm")
        )
        cents = _ivfa_cents(base)
        cents.write.parquet(os.path.join(path, "centroids"))
        write_partitioned(
            _ivfa_assign(base, cents),
            os.path.join(path, "assignments", "gen=0"), "cell",
        )
        meta = {
            "kind": "ivf_append",
            "fmt": ANN_INDEX_FMT,
            "nlist": IVFK_NLIST,
            "source": sf_dir,
            "gens": 1,
        }
        tmp = meta_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_path)

    # ---- append (gen 1): FROZEN centroids, delta-only scoring.  Any
    # gen=1 / staging dir present now is an UNADVERTISED partial
    # append (marker still says gens=1) — wipe and redo.
    gen1 = os.path.join(path, "assignments", "gen=1")
    stage = os.path.join(path, ".stage-gen1")
    shutil.rmtree(gen1, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    e = load(spark, sf_dir, "embeddings", spread=True)
    delta = e.where(F.col("vec_id") % 10 == 0).select(
        "vec_id", _micro_arr("embedding").alias("vm")
    )
    write_partitioned(_ivfa_assign(delta, cents), stage, "cell")
    os.replace(stage, gen1)  # atomic: readers see all of gen 1 or none
    meta = dict(meta, gens=2)
    tmp = meta_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)  # marker last: crashed append invisible
    return path


def heal_swapped_root(root: str) -> None:
    """Recover the two-rename compaction window (ADVICE r10): the swap
    is `os.replace(root, old); os.replace(stage, root)` — a crash
    between the two strands ALL data in an unadvertised ``.old-*``
    sibling and leaves serving broken with no root.  On entry to any
    compactor (and safe to call from serve paths), if the root is
    missing but exactly one ``.old-*`` sibling survives, rename it
    back — the old layout was complete by construction.  Multiple
    survivors would mean two interrupted compactions of the same root
    (impossible under the single-writer contract) — fail loudly
    rather than guess."""
    import os

    if os.path.isdir(root):
        return
    parent, base = os.path.dirname(root), os.path.basename(root)
    if not os.path.isdir(parent):
        return
    olds = [d for d in os.listdir(parent) if d.startswith(base + ".old-")]
    if len(olds) > 1:
        raise RuntimeError(
            f"{root} missing with {len(olds)} .old-* survivors {olds} — "
            "refusing to pick one; restore manually"
        )
    if olds:
        os.replace(os.path.join(parent, olds[0]), root)


def compact_ivf_append_index(spark: SparkSession, sf_dir: str, path: str | None = None) -> str:
    """LSM-style maintenance for the generational IVF index: fold every
    generation's assignments into a single rewritten gen=0 (same
    frozen centroids — compaction never retrains) so read fan-out
    stops growing with ingest count.  The marker's ``gens`` stays 2 —
    it records INGEST generations absorbed (the builder's idempotence
    key), not the physical layout; compaction adds ``compacted:
    true``.  Crash-safe: the merged tree is staged, the old
    assignments tree is atomically renamed aside, the new one renamed
    in, and the marker replaced LAST.  Each rename is atomic but the
    PAIR is not — a crash between them leaves no ``assignments/``
    root and a complete ``.old-*`` survivor; heal_swapped_root on
    entry renames the survivor back, so a retried compaction
    self-heals and the marker never advertises state that is not
    fully on disk.  Serving
    results are bit-identical before and after (tests/test_ann_index
    asserts it — both layouts hold the same frozen-centroid
    assignment set)."""
    import json
    import os
    import shutil
    import uuid

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "ivf_append")
    heal_swapped_root(os.path.join(path, "assignments"))
    build_ivf_append_index(spark, sf_dir, path=path)
    meta_path = os.path.join(path, "_INDEX_META.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    assign_root = os.path.join(path, "assignments")
    if meta.get("compacted") or not os.path.isdir(
        os.path.join(assign_root, "gen=1")
    ):
        return path  # already compact

    stage = os.path.join(path, ".stage-compact")
    shutil.rmtree(stage, ignore_errors=True)
    merged = None
    for g in range(meta["gens"]):
        gdir = os.path.join(assign_root, f"gen={g}")
        if not os.path.isdir(gdir):
            continue
        gf = spark.read.schema("vec_id bigint, vm array<bigint>, cell bigint").parquet(gdir)
        merged = gf if merged is None else merged.unionByName(gf)
    write_partitioned(merged, os.path.join(stage, "gen=0"), "cell")
    old = assign_root + f".old-{uuid.uuid4().hex[:8]}"
    os.replace(assign_root, old)      # old layout aside (atomic)
    os.replace(stage, assign_root)    # new single-gen layout in (atomic)
    meta = dict(meta, compacted=True)
    tmp = meta_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)  # marker last
    shutil.rmtree(old, ignore_errors=True)  # best-effort GC of the old tree
    return path


@register("q_ann_ivf_append", sql=_IVFA_SQL)
def q_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN served from the GENERATIONAL IVF index (base build + delta
    append under frozen centroids): probes from the persisted centroid
    table, candidates from the probed cells of BOTH generation
    directories (partition-pruned reads; an absent cell dir in a
    generation means that generation holds no vectors in the cell —
    skip, don't crash).  The oracle is the FULL-corpus assignment
    under the same frozen base-trained centroids, so the hash match
    proves base-build + delta-append answers bit-identically to a
    from-scratch rebuild over the unioned corpus — the strongest
    incremental-correctness oracle available (the text-append
    contract, applied to vectors)."""
    import os

    path = build_ivf_append_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    qv = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") <= KNN_QUERIES)
        .select(F.col("vec_id").alias("q_id"), _micro_arr("embedding").alias("qm"))
    )
    wp = Window.partitionBy("q_id").orderBy("sq", "cid")
    # persist: feeds both the cell-pruning collect and the candidate join
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .select("q_id", "qm", "cid", _int_sqdist(F.col("qm"), F.col("cm")).alias("sq"))
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= IVF_NPROBE)
        .select("q_id", "qm", F.col("cid").alias("cell"))
        .transform(scoped_persist)
    )
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    gen_frames = []
    for g in range(2):
        gdir = os.path.join(path, "assignments", f"gen={g}")
        if os.path.isdir(gdir):
            gen_frames.append(
                spark.read.schema("vec_id bigint, vm array<bigint>, cell bigint")
                .parquet(gdir)
                .where(F.col("cell").isin(cells))
            )
    assign = gen_frames[0]
    for gf in gen_frames[1:]:
        assign = assign.unionByName(gf)
    cand = assign.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    wr = Window.partitionBy("q_id").orderBy("sq", "vec_id")
    return (
        cand.select(
            "q_id", "vec_id", _int_sqdist(F.col("qm"), F.col("vm")).alias("sq")
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# --------------------- residual IVF-PQ generational append (r11): the
# q_ann_ivf_append lifecycle applied to the residual chain — base
# split trains IVF centroids AND residual codebooks; the delta is
# assigned + residual-encoded against both FROZEN tables and appended
# as gen=1; the oracle encodes the FULL corpus against the same
# base-trained tables in one shot, so the hash match proves
# base-build + delta-append == from-scratch rebuild.

_IVFPQ_RES_APPEND_SQL = f"""
    WITH vecs AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), base AS (
      SELECT * FROM vecs WHERE vec_id % 10 <> 0
    ), seeds AS (
      SELECT vec_id AS cid, vm AS cm FROM base
      WHERE vec_id BETWEEN 1 AND {IVFK_NLIST}
    ), d0 AS (
      SELECT v.vec_id, s.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - s.cm[i]) * (v.vm[i] - s.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM base v CROSS JOIN seeds s
    ), a0 AS (
      SELECT vec_id, cid FROM d0
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), elems AS (
      SELECT a.cid, unnest(range(1, len(v.vm) + 1)) AS pos, unnest(v.vm) AS m
      FROM a0 a JOIN base v USING (vec_id)
    ), cmeans AS (
      SELECT cid, pos, CAST(sum(m) AS BIGINT) // count(*) AS nm
      FROM elems GROUP BY cid, pos
    ), cents AS (
      SELECT cid, list(nm ORDER BY pos) AS cm FROM cmeans GROUP BY cid
    ), d1 AS (
      SELECT v.vec_id, c.cid,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - c.cm[i]) * (v.vm[i] - c.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM vecs v CROSS JOIN cents c
    ), assign AS (
      SELECT vec_id, cid AS cell FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), probes AS (
      SELECT vec_id AS q_id, cid AS cell FROM d1 WHERE vec_id <= {KNN_QUERIES}
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) <= {IVF_NPROBE}
    ), res AS (
      SELECT a.vec_id, a.cell,
             list_transform(range(1, len(v.vm) + 1), i -> v.vm[i] - c.cm[i]) AS rv
      FROM assign a
      JOIN vecs v USING (vec_id)
      JOIN cents c ON c.cid = a.cell
    ), rsub AS (
      SELECT vec_id, cell, m.m,
             list_transform(range(m.m * {PQ_DS} + 1, m.m * {PQ_DS} + {PQ_DS} + 1),
               i -> rv[i]) AS sv
      FROM res CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ), rsub_base AS (
      SELECT * FROM rsub WHERE vec_id % 10 <> 0
    ), rseeds AS (
      SELECT m, vec_id AS cid, sv AS cm FROM rsub_base WHERE vec_id < {PQ_K}
    ), ra0 AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, d.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {_pqt_dist_sql("s.sv", "d.cm")}, d.cid) AS rn
        FROM rsub_base s JOIN rseeds d ON d.m = s.m
      ) WHERE rn = 1
    ), relems AS (
      SELECT a.m, a.cid, unnest(range(1, {PQ_DS} + 1)) AS pos, unnest(s.sv) AS v
      FROM ra0 a JOIN rsub_base s ON s.vec_id = a.vec_id AND s.m = a.m
    ), rtmeans AS (
      SELECT m, cid, pos, CAST(sum(v) AS BIGINT) // count(*) AS nv
      FROM relems GROUP BY m, cid, pos
    ), rtcents AS (
      SELECT m, cid, list(nv ORDER BY pos) AS cm FROM rtmeans GROUP BY m, cid
    ), rcodes AS (
      SELECT vec_id, cell, m, cid FROM (
        SELECT s.vec_id, s.cell, s.m, t.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {_pqt_dist_sql("s.sv", "t.cm")}, t.cid) AS rn
        FROM rsub s JOIN rtcents t ON t.m = s.m
      ) WHERE rn = 1
    ), qres AS (
      SELECT p.q_id, p.cell,
             list_transform(range(1, len(v.vm) + 1), i -> v.vm[i] - c.cm[i]) AS rq
      FROM probes p
      JOIN vecs v ON v.vec_id = p.q_id
      JOIN cents c ON c.cid = p.cell
    ), qrsub AS (
      SELECT q_id, cell, m.m,
             list_transform(range(m.m * {PQ_DS} + 1, m.m * {PQ_DS} + {PQ_DS} + 1),
               i -> rq[i]) AS sv
      FROM qres CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    ), rqtab AS (
      SELECT s.q_id, s.cell, s.m, t.cid,
             {_pqt_dist_sql("s.sv", "t.cm")} AS qdint
      FROM qrsub s JOIN rtcents t ON t.m = s.m
    ), radc AS (
      SELECT p.q_id, c.vec_id, CAST(sum(q.qdint) AS BIGINT) AS adc_micro2
      FROM probes p
      JOIN rcodes c ON c.cell = p.cell
      JOIN rqtab q ON q.q_id = p.q_id AND q.cell = c.cell
                  AND q.m = c.m AND q.cid = c.cid
      WHERE c.vec_id <> p.q_id
      GROUP BY p.q_id, c.vec_id
    )
    SELECT q_id, vec_id AS neighbor_id, adc_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, adc_micro2,
             row_number() OVER (PARTITION BY q_id ORDER BY adc_micro2, vec_id) AS rn
      FROM radc
    ) WHERE rn <= {KNN_K}
    """


def build_ivfpq_res_append_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Two-GENERATION residual IVF-PQ index: gen 0 holds the base
    split's residual codes under IVF centroids AND residual codebooks
    trained on the base alone; the delta split (vec_id % 10 = 0) is
    assigned to the frozen centroids, residual-encoded against the
    frozen codebooks, and appended as ``codes/gen=1`` — only the delta
    is ever scored at append time.  Crash safety is the
    build_ivf_append_index marker contract: staged writes, atomic
    renames, marker (which alone advertises ``gens: 2``) replaced
    LAST; a retry wipes any unadvertised gen=1 before redoing the
    append."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "ivfpq_res_append")
    meta_path = os.path.join(path, "_INDEX_META.json")
    meta = None
    try:
        with open(meta_path) as fh:
            meta = json.load(fh)
        if (
            meta.get("fmt") != ANN_INDEX_FMT
            or meta.get("kind") != "ivfpq_res_append"
            or meta.get("source") != sf_dir
        ):
            meta = None
    except (OSError, ValueError):
        meta = None
    if force:
        meta = None
    if meta is not None and meta.get("gens") == 2:
        return path
    if meta is None:
        shutil.rmtree(path, ignore_errors=True)

        e = load(spark, sf_dir, "embeddings", spread=True)
        all_vecs = e.select("vec_id", _micro_arr("embedding").alias("vm"))
        base = all_vecs.where(F.col("vec_id") % 10 != 0)
        cents = _ivfa_cents(base)
        res_b = _ivfa_assign(base, cents).join(
            F.broadcast(cents.select(F.col("cid").alias("cell"), "cm")), "cell"
        ).select(
            "vec_id", "cell", F.zip_with("vm", "cm", lambda a, b: a - b).alias("rv")
        )
        rsub_b = _res_subvectors(res_b)
        rtcents = _pqt_trained_cents(rsub_b.select("vec_id", "m", "sv"))
        codes_b = (
            rsub_b.join(F.broadcast(rtcents), "m")
            .select(
                "vec_id", "cell", "m", "cid",
                _int_sqdist(F.col("sv"), F.col("cm")).alias("sq"),
            )
            .groupBy("vec_id", "m")
            .agg(
                F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cid"),
                F.first("cell").alias("cell"),
            )
        )
        cents.write.parquet(os.path.join(path, "centroids"))
        rtcents.write.parquet(os.path.join(path, "rcodebook"))
        write_partitioned(codes_b, os.path.join(path, "codes", "gen=0"), "cell")
        meta = {
            "kind": "ivfpq_res_append", "fmt": ANN_INDEX_FMT,
            "nlist": IVFK_NLIST, "nprobe": IVF_NPROBE, "m": PQ_M, "k": PQ_K,
            "source": sf_dir, "gens": 1,
        }
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_path)

    # append the delta under the FROZEN tables (idempotent retry:
    # wipe any unadvertised gen=1 staging first)
    import uuid

    gen1 = os.path.join(path, "codes", "gen=1")
    shutil.rmtree(gen1, ignore_errors=True)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    rtcents = spark.read.schema("m int, cid bigint, cm array<bigint>").parquet(
        os.path.join(path, "rcodebook")
    )
    e = load(spark, sf_dir, "embeddings")
    delta = e.where(F.col("vec_id") % 10 == 0).select(
        "vec_id", _micro_arr("embedding").alias("vm")
    )
    res_d = _ivfa_assign(delta, cents).join(
        F.broadcast(cents.select(F.col("cid").alias("cell"), "cm")), "cell"
    ).select(
        "vec_id", "cell", F.zip_with("vm", "cm", lambda a, b: a - b).alias("rv")
    )
    codes_d = (
        _res_subvectors(res_d).join(F.broadcast(rtcents), "m")
        .select(
            "vec_id", "cell", "m", "cid",
            _int_sqdist(F.col("sv"), F.col("cm")).alias("sq"),
        )
        .groupBy("vec_id", "m")
        .agg(
            F.min_by("cid", F.struct(F.col("sq"), F.col("cid"))).alias("cid"),
            F.first("cell").alias("cell"),
        )
    )
    stage = os.path.join(path, f".stage-gen1-{uuid.uuid4().hex[:8]}")
    write_partitioned(codes_d, stage, "cell")
    os.replace(stage, gen1)  # atomic: readers see all of gen 1 or none
    meta = dict(meta, gens=2)
    tmp = meta_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)  # marker last: crashed append invisible
    return path


@register("q_ann_ivfpq_res_append", sql=_IVFPQ_RES_APPEND_SQL)
def q_ann_ivfpq_res_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-ADC k-NN served from the GENERATIONAL residual IVF-PQ
    index (base build + delta append under frozen centroids AND
    frozen residual codebooks): probes + per-cell query ADT from the
    persisted tables, candidates from the probed cells of BOTH code
    generations (partition-pruned reads; an absent cell dir in a
    generation holds no codes — skip).  The oracle encodes the FULL
    corpus against the same base-trained tables in one shot, so the
    hash match proves base-build + delta-append answers bit-
    identically to a from-scratch rebuild — the q_ann_ivf_append
    contract extended through BOTH frozen quantizers."""
    import os

    path = build_ivfpq_res_append_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    rtcents = spark.read.schema("m int, cid bigint, cm array<bigint>").parquet(
        os.path.join(path, "rcodebook")
    )
    probes, rqtab, _ = _ivfpq_res_query_frames(spark, sf_dir, cents, rtcents)
    probes = scoped_persist(probes)
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    gen_frames = []
    for g in range(2):
        gdir = os.path.join(path, "codes", f"gen={g}")
        if os.path.isdir(gdir):
            gen_frames.append(
                spark.read.schema("vec_id bigint, m int, cid bigint, cell bigint")
                .parquet(gdir)
                .where(F.col("cell").isin(cells))
            )
    codes = gen_frames[0]
    for gf in gen_frames[1:]:
        codes = codes.unionByName(gf)
    return _ivfpq_res_rank(codes, probes, rqtab)


@register(
    "q_auc_ranksum",
    sql="""
    WITH vecs AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), scored AS (
      SELECT label,
             CAST(floor(list_reduce(list_transform(v, x -> x * x),
                                    (a, b) -> a + b) * 1000000 + 0.5)
                  AS BIGINT) AS score
      FROM vecs
    ), by_score AS (
      SELECT score, count(*) AS cnt,
             CAST(count_if(label = 0) AS BIGINT) AS pos_cnt
      FROM scored GROUP BY score
    ), ranked AS (
      SELECT score, cnt, pos_cnt,
             1 + COALESCE(CAST(sum(cnt) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS min_rank
      FROM by_score
    ), agg AS (
      SELECT CAST(sum(CAST(pos_cnt AS HUGEINT) * (2 * min_rank + cnt - 1))
                  AS HUGEINT) AS r1_2x,
             CAST(sum(pos_cnt) AS BIGINT) AS n_pos,
             CAST(sum(cnt) AS BIGINT) AS n_all
      FROM ranked
    )
    SELECT n_pos, n_all - n_pos AS n_neg,
           CAST(floor(
             CAST(r1_2x - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
             / CAST(2 * CAST(n_pos AS HUGEINT) * (n_all - n_pos) AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS auc_micro
    FROM agg
    """,
)
def q_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum identity — the
    threshold-free classifier eval (here: does squared embedding norm
    separate label 0 from the rest?).  AUC is invariant under monotone
    score transforms, so the sqrt is designed out (squared norm as the
    score); scores snap to integer micro-units, tied scores get exact
    midranks DOUBLED so every rank quantity stays an integer
    (2·midrank = 2·minrank + cnt − 1), and the single float op is one
    division of two identical 128-bit-exact integers.

    Scale shape: per-row scoring is a narrow map; ranking happens over
    the DISTINCT-SCORE table via a TWO-LEVEL rank (coarse-bucket
    offsets broadcast back + a bucket-partitioned fine window — scores
    are near-unique, so a single unpartitioned window would globally
    sort ~|rows| entries on one task), and the final reduce is one
    row.  The rank-sum products run in HUGEINT/DECIMAL
    because pos_cnt·rank sums overflow int64 past ~1e9 rows."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    ss = F.aggregate(
        _as_double("embedding"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    scored = e.select(
        F.floor(ss * 1000000 + F.lit(0.5)).cast("long").alias("score"),
        (F.col("label") == 0).alias("pos"),
    )
    by_score = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_if(F.col("pos")).alias("pos_cnt"),
    )
    # distributed ranking: scores are near-unique, so a single global
    # window here would sort ~|rows| distinct scores on ONE partition.
    # Standard two-level rank instead: coarse 2^20-wide buckets carry a
    # running offset (window over the ~bucket-count table, broadcast
    # back) and the fine window is PARTITIONED by bucket — both sorts
    # stay small/parallel and min_rank is identical.
    bucketed = by_score.withColumn("b", F.expr("score div 1048576"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        bucketed.groupBy("b")
        .agg(F.sum("cnt").alias("bn"))
        .withColumn("b_off", F.coalesce(F.sum("bn").over(wb), F.lit(0)))
        .select("b", "b_off")
    )
    wloc = Window.partitionBy("b").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = (
        bucketed.join(F.broadcast(boff), "b")
        .withColumn(
            "min_rank",
            F.lit(1)
            + F.col("b_off")
            + F.coalesce(F.sum("cnt").over(wloc), F.lit(0)),
        )
    )
    agg = ranked.agg(
        F.sum(
            F.col("pos_cnt").cast("decimal(20,0)")
            * (2 * F.col("min_rank") + F.col("cnt") - 1).cast("decimal(20,0)")
        ).alias("r1_2x"),
        F.sum("pos_cnt").alias("n_pos"),
        F.sum("cnt").alias("n_all"),
    )
    np_ = F.col("n_pos").cast("decimal(20,0)")
    u_2x = (F.col("r1_2x") - np_ * (F.col("n_pos") + 1).cast("decimal(20,0)")).cast(
        "double"
    )
    den = (2 * np_ * (F.col("n_all") - F.col("n_pos")).cast("decimal(20,0)")).cast(
        "double"
    )
    return agg.select(
        "n_pos",
        (F.col("n_all") - F.col("n_pos")).alias("n_neg"),
        F.floor(u_2x / den * 1000000 + F.lit(0.5)).cast("long").alias("auc_micro"),
    )


HARDNEG_K = 3


@register(
    "q_hard_negatives",
    sql=f"""
    SELECT q_id, vec_id AS negative_id, cos_sim, rn AS rank
    FROM (
      SELECT q.vec_id AS q_id, e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               -- ROUNDED selection key (CLAUDE.md arg-max rule): Spark
               -- ranks by round(cos,6), so the oracle must too — raw
               -- last-bit order could flip a 6-dp tie
               ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                     CAST(q.embedding AS DOUBLE[])), 6) DESC,
                        e.vec_id
             ) AS rn
      FROM embeddings q
      JOIN embeddings e ON e.vec_id <> q.vec_id AND e.label <> q.label
      WHERE q.vec_id <= {KNN_QUERIES}
    )
    WHERE rn <= {HARDNEG_K}
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for
    each anchor vector, the {HARDNEG_K} most-similar vectors with a
    DIFFERENT label (near the anchor in embedding space but
    semantically wrong — the negatives that actually teach the model,
    versus random negatives that are trivially far).  Same broadcast +
    windowed top-k machinery as q_knn_join with the label-mismatch
    predicate fused into the pair stage, so no candidate is scored
    twice.

    Scale shape: anchors broadcast (small query set), similarity is
    one corpus pass, per-anchor top-k via window.  For corpus×corpus
    mining at 100 TB, block by the LSH buckets of q_ann_lsh and mine
    within buckets — same swap as k-NN."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    corpus = e.select(
        "vec_id", "label", _as_double("embedding").alias("emb")
    ).withColumn("nrm", l2norm(F.col("emb")))
    q = corpus.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    sim = (
        corpus.crossJoin(F.broadcast(q))
        .where((F.col("vec_id") != F.col("q_id")) & (F.col("label") != F.col("q_label")))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HARDNEG_K)
        .select("q_id", F.col("vec_id").alias("negative_id"), "cos_sim", "rank")
    )


# Graph ANN (VERDICT r5 missing #4): HNSW-class serving quality via a
# Spark-shaped construction — no mutable in-memory graph, everything a
# join.  Build: a k-NN GRAPH over LSH-candidate pairs (degree-bounded,
# bucket-capped).  Serve: seed with the query's LSH bucket mates, then
# expand one hop along graph edges — neighbors-of-neighbors recover
# true neighbors that collide with the query in NO table, which is
# exactly the recall LSH alone loses.  Expanded ⊇ seeds, so recall is
# provably >= q_ann_lsh's (asserted in tests/test_properties.py).
GRAPH_DEGREE = 8
GRAPH_BUCKET_CAP = 512  # per-(table,bucket) build cap: bounds pair
# emission at C(cap,2) per bucket (the NGRAM/BAND cap argument again);
# fixture max bucket is ~n/16 = 125 at sf0.1, so the cap is inert here.


def _graph_sql() -> str:
    buckets_b = ", ".join(f"{_sql_bucket(t)} AS bucket{t}" for t in range(LSH_TABLES))
    long_rows = "\n      UNION ALL ".join(
        f"SELECT {t} AS tbl, bucket{t} AS bucket, vec_id FROM b"
        for t in range(LSH_TABLES)
    )
    seed_rows = "\n      UNION ".join(
        f"SELECT q.q_id, bb.vec_id FROM b bb JOIN q ON bb.bucket{t} = q.qbucket{t}"
        f" AND bb.vec_id <> q.q_id"
        for t in range(LSH_TABLES)
    )
    qcols = ", ".join(f"bucket{t} AS qbucket{t}" for t in range(LSH_TABLES))
    return f"""
    WITH b AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, {buckets_b}
      FROM embeddings
    ), long AS (
      {long_rows}
    ), capped AS (
      SELECT tbl, bucket, vec_id FROM long
      QUALIFY count(*) OVER (PARTITION BY tbl, bucket) <= {GRAPH_BUCKET_CAP}
    ), pair_ids AS (
      SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
      FROM capped a JOIN capped c
        ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id <> c.vec_id
    ), edges AS (
      SELECT src, dst FROM (
        SELECT p.src, p.dst,
               row_number() OVER (PARTITION BY p.src
                 ORDER BY round(list_cosine_similarity(s.emb, d.emb), 6) DESC, p.dst) AS rn
        FROM pair_ids p JOIN b s ON s.vec_id = p.src JOIN b d ON d.vec_id = p.dst
      ) WHERE rn <= {GRAPH_DEGREE}
    ), q AS (
      SELECT vec_id AS q_id, emb AS qvec, {qcols}
      FROM b WHERE vec_id <= {KNN_QUERIES}
    ), seeds AS (
      {seed_rows}
    ), expanded AS (
      SELECT q_id, vec_id FROM seeds
      UNION
      SELECT s.q_id, e.dst AS vec_id
      FROM seeds s JOIN edges e ON e.src = s.vec_id
      WHERE e.dst <> s.q_id
    )
    SELECT q_id, vec_id AS neighbor_id, round(cos_raw, 6) AS cos_sim, rn AS rank
    FROM (
      SELECT x.q_id, x.vec_id,
             list_cosine_similarity(c.emb, q.qvec) AS cos_raw,
             row_number() OVER (PARTITION BY x.q_id
               ORDER BY round(list_cosine_similarity(c.emb, q.qvec), 6) DESC, x.vec_id) AS rn
      FROM expanded x
      JOIN b c ON c.vec_id = x.vec_id
      JOIN q ON q.q_id = x.q_id
    ) t
    WHERE rn <= {KNN_K}
    """


def graph_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    bits: int | None = None,
    tables: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Parameterized graph-ANN build+serve (the q_ann_graph pipeline
    with the LSH width exposed): ``bits`` is the per-table sign-bit
    count — THE knob a deployment turns as the corpus grows (bits ≈
    log2(n / target_bucket)); defaults reproduce the registered key
    exactly.  tools/ann_bits_probe.py measures recall + wall-clock at
    64x embeddings under the re-parameterization (SCALE.md r8)."""
    bits = LSH_BITS if bits is None else bits
    n_tables = LSH_TABLES if tables is None else tables
    cap = GRAPH_BUCKET_CAP if bucket_cap is None else bucket_cap
    if n_tables * bits > IVF_DIM:
        raise ValueError(
            f"tables*bits = {n_tables * bits} sign planes exceed the "
            f"{IVF_DIM}-dim embedding (ANSI element_at would throw "
            f"mid-job); reduce bits or tables"
        )
    e = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", _as_double("embedding").alias("emb")
    ).withColumn("nrm", l2norm(F.col("emb")))
    for t in range(n_tables):
        e = e.withColumn(f"bucket{t}", _table_bucket_expr("emb", t, bits))
    # NOTE (r8, VERDICT r7 wrong #4): persisting shared frames here was
    # measured a DEAD END (isolated 3-pass, sf0.1, BASELINE.md v11):
    # no persist 5.8-8.0 s; scoped_persist(e) 7.3-8.8 s;
    # scoped_persist(capped) 6.5-8.2 s.  The scan + md5 bucket exprs
    # fuse into each consumer's codegen stage, so recomputation is
    # cheaper than materializing the wide vector frame or breaking
    # the union+window into a cached block.  Keep the lazy plan.

    # ---- build: degree-bounded k-NN graph over LSH-candidate pairs
    longf = None
    for t in range(n_tables):
        part = e.select(
            F.lit(t).alias("tbl"), F.col(f"bucket{t}").alias("bucket"), "vec_id"
        )
        longf = part if longf is None else longf.unionByName(part)
    wcap = Window.partitionBy("tbl", "bucket")
    capped = (
        longf.withColumn("bsz", F.count(F.lit(1)).over(wcap))
        .where(F.col("bsz") <= cap)
        .drop("bsz")
    )
    # local pair generation from per-bucket posting arrays (the r4
    # q_dedup_ngram pattern, applied r15): the cap bounds every array
    # at ``cap`` ids, so ordered pairs explode locally off ONE collect
    # per (tbl, bucket) — the bucket×bucket self-join (a second
    # shuffle of the capped stream + a join stage) is gone.  Same pair
    # SET (equality-verified at sf0.1: 910,352 pairs both shapes;
    # SCALE.md r15).
    pair_ids = (
        capped.groupBy("tbl", "bucket")
        .agg(F.collect_list("vec_id").alias("ids"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, a -> transform("
                    "filter(ids, c -> c != a), c -> struct(a AS src, c AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
    )
    src_e = e.select(
        F.col("vec_id").alias("src"), F.col("emb").alias("semb"), F.col("nrm").alias("snrm")
    )
    dst_e = e.select(
        F.col("vec_id").alias("dst"), F.col("emb").alias("demb"), F.col("nrm").alias("dnrm")
    )
    scored = pair_ids.join(src_e, "src").join(dst_e, "dst").select(
        "src",
        "dst",
        F.round(
            dot(F.col("semb"), F.col("demb")) / (F.col("snrm") * F.col("dnrm")), 6
        ).alias("cs"),
    )
    we = Window.partitionBy("src").orderBy(F.desc("cs"), F.asc("dst"))
    edges = (
        scored.withColumn("rn", F.row_number().over(we))
        .where(F.col("rn") <= GRAPH_DEGREE)
        .select("src", "dst")
    )

    # ---- serve: LSH seeds + one-hop expansion, exact re-rank
    q = e.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qvec"),
        F.col("nrm").alias("qnrm"),
        *[F.col(f"bucket{t}").alias(f"qbucket{t}") for t in range(n_tables)],
    )
    # one OR-predicate broadcast join instead of n_tables separate
    # joins + union (r15): same seed SET after distinct, ONE corpus
    # scan — measured 1.54 → 0.61 s isolated at sf0.1 (SCALE.md r15)
    any_tbl = None
    for t in range(n_tables):
        c = e[f"bucket{t}"] == q[f"qbucket{t}"]
        any_tbl = c if any_tbl is None else (any_tbl | c)
    seeds = (
        e.join(F.broadcast(q), on=any_tbl)
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    hop = (
        seeds.join(edges, on=seeds.vec_id == edges.src)
        .select("q_id", F.col("dst").alias("vec_id"))
        .where(F.col("vec_id") != F.col("q_id"))
    )
    expanded = seeds.unionByName(hop.select("q_id", "vec_id")).distinct()
    cand = expanded.join(
        e.select("vec_id", "emb", "nrm"), "vec_id"
    ).join(F.broadcast(q.select("q_id", "qvec", "qnrm")), "q_id")
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


@register("q_ann_graph", sql=_graph_sql())
def q_ann_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-augmented ANN (see the family note above).

    Build (offline at scale, amortized like build_ivf_index): LSH
    candidate pairs — per-table bucket equi-joins, per-(table,bucket)
    df cap bounding pair emission at C(cap,2) — deduped, exact-scored,
    and cut to the top-GRAPH_DEGREE edges per vector (one window over
    the candidate stream, partitioned by src).  Serve: the query's
    bucket mates (exactly q_ann_lsh's candidates) plus one hop along
    graph edges; exact cosine re-ranks the expanded set.  Every stage
    is an equi-join or a partitioned window — nothing all-pairs,
    nothing iterative, no mutable state — which is the Spark-native
    answer to HNSW's serving-recall trick.  Deterministic end to end
    (fixed-sign buckets, round-6 + id tie-breaks), so the full build
    AND serve replay under the SQL oracle.  Body lives in
    :func:`graph_ann_topk` (r8: LSH width parameterized for the
    bits-scaling probe); defaults reproduce this key exactly."""
    return graph_ann_topk(spark, sf_dir)


def build_graph_index(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Persist the graph-ANN index: the degree-bounded edge list
    (partitioned by src-bucket for pruned hop reads is unnecessary —
    edges are 2 ints/row) plus the (table, bucket) -> member posting
    needed to seed queries without rescanning the corpus, plus the
    corpus vectors keyed by id for candidate re-ranking.  Build once,
    serve many — the same contract as build_ivf_index/build_pq_index;
    at 100 TB the O(n·bucket) pair scoring happens once offline."""
    import json
    import os
    import shutil

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(ANN_INDEX_ROOT, tag, "graph")
    meta = os.path.join(path, "_INDEX_META.json")
    if _index_is_current(meta, kind="graph") and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    e = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", _as_double("embedding").alias("emb")
    ).withColumn("nrm", l2norm(F.col("emb")))
    for t in range(LSH_TABLES):
        e = e.withColumn(f"bucket{t}", _table_bucket_expr("emb", t))
    longf = None
    for t in range(LSH_TABLES):
        part = e.select(
            F.lit(t).alias("tbl"), F.col(f"bucket{t}").alias("bucket"), "vec_id"
        )
        longf = part if longf is None else longf.unionByName(part)
    wcap = Window.partitionBy("tbl", "bucket")
    capped = (
        longf.withColumn("bsz", F.count(F.lit(1)).over(wcap))
        .where(F.col("bsz") <= GRAPH_BUCKET_CAP)
        .drop("bsz")
    )
    # local pair generation from per-bucket posting arrays (the r4
    # q_dedup_ngram pattern, applied r15): the cap bounds every array
    # at ``cap`` ids, so ordered pairs explode locally off ONE collect
    # per (tbl, bucket) — the bucket×bucket self-join (a second
    # shuffle of the capped stream + a join stage) is gone.  Same pair
    # SET (equality-verified at sf0.1: 910,352 pairs both shapes;
    # SCALE.md r15).
    pair_ids = (
        capped.groupBy("tbl", "bucket")
        .agg(F.collect_list("vec_id").alias("ids"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, a -> transform("
                    "filter(ids, c -> c != a), c -> struct(a AS src, c AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
    )
    src_e = e.select(
        F.col("vec_id").alias("src"), F.col("emb").alias("semb"), F.col("nrm").alias("snrm")
    )
    dst_e = e.select(
        F.col("vec_id").alias("dst"), F.col("emb").alias("demb"), F.col("nrm").alias("dnrm")
    )
    scored = pair_ids.join(src_e, "src").join(dst_e, "dst").select(
        "src",
        "dst",
        F.round(
            dot(F.col("semb"), F.col("demb")) / (F.col("snrm") * F.col("dnrm")), 6
        ).alias("cs"),
    )
    we = Window.partitionBy("src").orderBy(F.desc("cs"), F.asc("dst"))
    edges = (
        scored.withColumn("rn", F.row_number().over(we))
        .where(F.col("rn") <= GRAPH_DEGREE)
        .select("src", "dst")
    )
    edges.write.parquet(os.path.join(path, "edges"))
    longf.write.parquet(os.path.join(path, "buckets"))
    e.select("vec_id", "emb", "nrm").write.parquet(os.path.join(path, "vectors"))
    tmp = meta + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"kind": "graph", "fmt": ANN_INDEX_FMT, "degree": GRAPH_DEGREE,
             "tables": LSH_TABLES, "source": sf_dir},
            fh,
        )
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_ann_graph_serve", sql=_graph_sql())
def q_ann_graph_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN *serving* path: the k-NN graph, bucket postings, and
    id-keyed vectors come from the persisted index (build_graph_index)
    — query time is only: hash the query vectors into their buckets,
    equi-join the persisted postings for seeds, one equi-join along
    the persisted edges for the expansion hop, and an exact re-rank of
    the (small) candidate union.  The O(corpus·bucket) pair-scoring
    build never runs at query time.  Shares q_ann_graph's oracle —
    results are bit-identical, certifying the edge/posting/vector
    round trip through parquet."""
    import os

    path = build_graph_index(spark, sf_dir)
    edges = spark.read.parquet(os.path.join(path, "edges"))
    postings = spark.read.parquet(os.path.join(path, "buckets"))
    vectors = spark.read.parquet(os.path.join(path, "vectors"))

    q = load(spark, sf_dir, "embeddings").where(
        F.col("vec_id") <= KNN_QUERIES
    ).select(F.col("vec_id").alias("q_id"), _as_double("embedding").alias("qvec"))
    q = q.withColumn("qnrm", l2norm(F.col("qvec")))
    for t in range(LSH_TABLES):
        q = q.withColumn(f"qbucket{t}", _table_bucket_expr("qvec", t))
    qb = None
    for t in range(LSH_TABLES):
        part = q.select(
            "q_id", F.lit(t).alias("tbl"), F.col(f"qbucket{t}").alias("bucket")
        )
        qb = part if qb is None else qb.unionByName(part)
    seeds = (
        postings.join(F.broadcast(qb), on=["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    hop = (
        seeds.join(edges, on=seeds.vec_id == edges.src)
        .select("q_id", F.col("dst").alias("vec_id"))
        .where(F.col("vec_id") != F.col("q_id"))
    )
    expanded = seeds.unionByName(hop.select("q_id", "vec_id")).distinct()
    cand = expanded.join(vectors, "vec_id").join(
        F.broadcast(q.select("q_id", "qvec", "qnrm")), "q_id"
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


# ------------------------------------------------------- MMR reranking

MMR_POOL = 32  # candidate pool = top-POOL by query similarity
MMR_K = 5  # diversified picks
# lambda = 0.5: mmr = 0.5 * (qsim - max_sim_to_selected) — an exact
# halving of an exact difference, no float hazard beyond the 6dp
# rounding both engines already agree on for cosines


def _mmr_sql() -> str:
    """Unrolled-iteration oracle (the graph.py chained-CTE pattern):
    pick 1 is the best qsim; each later pick re-scores the remaining
    pool against the UNION of prior picks.  All sims are the same
    6dp-rounded cosines the Spark side collects, so the float chain
    (0.5 * (qsim - max(sim))) is identical double arithmetic."""
    ctes = [
        f"""q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings
      WHERE vec_id = {QUERY_VEC_ID}
    ), pool AS (
      SELECT e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 6)
               AS qsim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> {QUERY_VEC_ID}
      ORDER BY qsim DESC, e.vec_id
      LIMIT {MMR_POOL}
    ), pp AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                          CAST(eb.embedding AS DOUBLE[])), 6) AS sim
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ), s1 AS (
      SELECT vec_id, qsim AS score FROM pool ORDER BY qsim DESC, vec_id LIMIT 1
    ), sel1 AS (SELECT vec_id FROM s1)"""
    ]
    for i in range(2, MMR_K + 1):
        prev = i - 1
        ctes.append(
            f"""s{i} AS (
      SELECT p.vec_id,
             CAST(0.5 AS DOUBLE) * (p.qsim - (
               SELECT max(pp.sim) FROM pp
               WHERE pp.a = p.vec_id AND pp.b IN (SELECT vec_id FROM sel{prev})
             )) AS score
      FROM pool p
      WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{prev})
      ORDER BY score DESC, p.vec_id LIMIT 1
    ), sel{i} AS (
      SELECT vec_id FROM sel{prev} UNION ALL SELECT vec_id FROM s{i}
    )"""
        )
    unions = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, score FROM s{i}" for i in range(1, MMR_K + 1)
    )
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(rank AS BIGINT) AS rank, vec_id,
           CAST(floor(score * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                AS BIGINT) AS mmr_score_e6
    FROM ({unions})
    ORDER BY rank
    """


@register("q_mmr_rerank", sql=_mmr_sql())
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance reranking — the diversification step
    of retrieval and training-data selection (don't return/keep five
    near-copies of the best hit): greedily pick k items maximizing
    ``lambda*qsim - (1-lambda)*max_sim_to_already_picked``.

    Scale split: the DISTRIBUTED work is the corpus scan + top-POOL
    candidate generation (TakeOrdered, same shape as
    q_topk_similarity) and the pool's pairwise cosines (POOL^2 tiny
    self-join) — both computed by Spark.  The greedy selection itself
    is inherently sequential over a CAPPED pool (32 rows), so it runs
    driver-side over the collected pool like graph.py's scalar
    convergence checks — bounded by the cap, never data-sized.  Both
    engines consume the same 6dp-rounded cosines, and every later op
    (halving, subtraction, max, compare) is exact IEEE double, so the
    pick sequence and scores hash-match exactly."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(
        _as_double("embedding").alias("qvec")
    )
    pool = (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(_as_double("embedding"), F.col("qvec")), 6).alias("qsim"),
        )
        .orderBy(F.desc("qsim"), F.asc("vec_id"))
        .limit(MMR_POOL)
    )
    pool_rows = pool.collect()  # bounded by MMR_POOL — scalar-sized
    ids = [r.vec_id for r in pool_rows]
    qsim = {r.vec_id: r.qsim for r in pool_rows}
    pv = e.where(F.col("vec_id").isin(ids)).select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    a = pv.select(F.col("vec_id").alias("a"), F.col("emb").alias("ea"))
    b = pv.select(F.col("vec_id").alias("b"), F.col("emb").alias("eb"))
    sims = {
        (r.a, r.b): r.sim
        for r in a.join(b, F.col("a") != F.col("b"))
        .select("a", "b", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("sim"))
        .collect()  # bounded: POOL^2 rows
    }
    picks: list[tuple[int, int, float]] = []
    selected: list[int] = []
    for rank in range(1, MMR_K + 1):
        best = None
        for v in ids:
            if v in selected:
                continue
            if not selected:
                score = qsim[v]
            else:
                score = 0.5 * (qsim[v] - max(sims[(v, s)] for s in selected))
            # ORDER BY score DESC, vec_id — same total order as the oracle
            key = (-score, v)
            if best is None or key < best[0]:
                best = (key, v, score)
        picks.append((rank, best[1], best[2]))
        selected.append(best[1])
    out = spark.createDataFrame(
        [
            (rank, vid, math.floor(score * 1000000.0 + 0.5))
            for rank, vid, score in picks
        ],
        "rank bigint, vec_id bigint, mmr_score_e6 bigint",
    )
    return out.orderBy("rank")


# ------------------------------------------------------------ recall eval

from processor_spark import registry as _registry_mod

_RECALL_SQL = f"""
    WITH approx AS (
      SELECT q_id, neighbor_id FROM ({_registry_mod._REGISTRY["q_ann_ivf"].sql}) ia
    ), exact AS (
      SELECT q_id, neighbor_id FROM ({_registry_mod._REGISTRY["q_knn_join"].sql}) ie
    ), hits AS (
      SELECT e.q_id, count(a.neighbor_id) AS n_hits
      FROM exact e
      LEFT JOIN approx a ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.q_id
    )
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST((n_hits * 100) // {KNN_K} AS BIGINT) AS recall_pct
    FROM hits ORDER BY q_id
"""


@register("q_ann_recall", sql=_RECALL_SQL)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against exact brute-force k-NN, per
    query — the acceptance gate an ANN rollout runs before swapping
    the index in.  Because both pipelines are deterministic and
    SQL-oracled, the recall itself gets a FULL hash oracle (the
    oracle composes the two registered twins as CTEs) — unlike
    q_ann_ml, whose MLlib hash family forces a rows-only floor
    check.  recall_pct is exact integer arithmetic (hits*100 div k).
    Cost: the two pipelines plus a key-key join on (query, neighbor)
    — output is query-set-sized."""
    a = q_ann_ivf(spark, sf_dir).select("q_id", "neighbor_id").withColumn(
        "hit", F.lit(1)
    )
    ex = q_knn_join(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        ex.join(a, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "q_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"CAST((n_hits * 100) div {KNN_K} AS BIGINT)").alias("recall_pct"),
        )
        .orderBy("q_id")
    )


# ------------------------------------------------------------ mutual NN

_MNN_SQL = f"""
    WITH qs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id <= {KNN_QUERIES}
    ), top1 AS (
      SELECT vec_id, nb, cs FROM (
        SELECT a.vec_id, b.vec_id AS nb,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS cs,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.emb, b.emb), 6) DESC,
                          b.vec_id) AS rn
        FROM qs a JOIN qs b ON a.vec_id <> b.vec_id
      ) WHERE rn = 1
    )
    SELECT x.vec_id AS vec_a, x.nb AS vec_b, x.cs AS cos_sim
    FROM top1 x JOIN top1 y ON y.vec_id = x.nb AND y.nb = x.vec_id
    WHERE x.vec_id < x.nb
    ORDER BY vec_a
"""


@register("q_mutual_nn", sql=_MNN_SQL)
def q_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-nearest-neighbor pairs within the query set — the
    reciprocal-best-match criterion parallel-corpus mining and
    cross-source alignment use (a pair counts only if each side is
    the OTHER's top-1, which suppresses hub vectors that are
    everyone's neighbor but nobody's match).  Same rounded-cosine /
    (sim DESC, id) arg-max contract as the k-NN family; mutuality is
    one self-join of the top-1 table.  At corpus scale the top-1
    table comes from any ANN path (LSH/IVF/PQ) — the mutual join
    itself is key-key and cheap."""
    e = load(spark, sf_dir, "embeddings")
    qs = (
        e.where(F.col("vec_id") <= KNN_QUERIES)
        .select("vec_id", _as_double("embedding").alias("emb"))
        .withColumn("nrm", l2norm(F.col("emb")))
    )
    right = qs.select(
        F.col("vec_id").alias("nb"),
        F.col("emb").alias("bemb"),
        F.col("nrm").alias("bnrm"),
    )
    sim = (
        qs.crossJoin(F.broadcast(right))
        .where(F.col("vec_id") != F.col("nb"))
        .select(
            "vec_id",
            "nb",
            F.round(
                dot(F.col("emb"), F.col("bemb")) / (F.col("nrm") * F.col("bnrm")), 6
            ).alias("cs"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("nb"))
    top1 = sim.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
        "vec_id", "nb", "cs"
    )
    rev = top1.select(
        F.col("vec_id").alias("nb"), F.col("nb").alias("vec_id_rev")
    )
    return (
        top1.join(rev, (top1.nb == rev.nb) & (top1.vec_id == rev.vec_id_rev))
        .where(F.col("vec_id") < top1.nb)
        .select(
            F.col("vec_id").alias("vec_a"),
            top1.nb.alias("vec_b"),
            F.col("cs").alias("cos_sim"),
        )
        .orderBy("vec_a")
    )


# ---------------------------------------------- compression-recall evals

_TRUNC_D = 16  # retained prefix dimensions (4x storage cut)


def _trunc_recall_sql() -> str:
    """Recall@k of prefix-truncated (16 of 64 dims) cosine retrieval
    against the exact k-NN — composes the registered q_knn_join oracle
    (the q_ann_recall pattern)."""
    exact = _registry_mod._REGISTRY["q_knn_join"].sql
    return f"""
    WITH trunc AS (
      SELECT q_id, vec_id AS neighbor_id FROM (
        SELECT q.vec_id AS q_id, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[])[1:{_TRUNC_D}],
                            CAST(q.embedding AS DOUBLE[])[1:{_TRUNC_D}]), 6) DESC,
                          e.vec_id) AS rn
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id <= {KNN_QUERIES}
      ) WHERE rn <= {KNN_K}
    ), exact AS (
      SELECT q_id, neighbor_id FROM ({exact}) ie
    )
    SELECT e.q_id, CAST(count(t.neighbor_id) AS BIGINT) AS n_hits,
           CAST((count(t.neighbor_id) * 100) // {KNN_K} AS BIGINT) AS recall_pct
    FROM exact e
    LEFT JOIN trunc t ON t.q_id = e.q_id AND t.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    ORDER BY e.q_id
    """


@register("q_dim_truncation_recall", sql=_trunc_recall_sql())
def q_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style storage question, answered exactly: if vectors
    are truncated to their first 16 of 64 dimensions (4x smaller), how
    much of the exact top-5 neighborhood survives?  Per-query recall
    of prefix-cosine retrieval vs the full-dimension exact k-NN (both
    deterministic and SQL-oracled, so the recall itself gets a full
    hash oracle — the q_ann_recall composition pattern).

    Scale shape: identical to q_knn_join (broadcast query set, one
    corpus pass, per-query top-k window) run at a quarter of the
    arithmetic; the recall join is query-set-sized."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    corpus = e.select(
        "vec_id",
        F.expr(f"slice(CAST(embedding AS ARRAY<DOUBLE>), 1, {_TRUNC_D})").alias("emb"),
    ).withColumn("nrm", l2norm(F.col("emb")))
    q = corpus.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    sim = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot(F.col("emb"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    trunc = (
        sim.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
        .withColumn("hit", F.lit(1))
    )
    exact = q_knn_join(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        exact.join(trunc, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").cast("long").alias("n_hits"))
        .select(
            "q_id",
            "n_hits",
            F.expr(f"CAST((n_hits * 100) div {KNN_K} AS BIGINT)").alias("recall_pct"),
        )
        .orderBy("q_id")
    )


def _sign_words_sql(tbl: str) -> str:
    words = []
    for w0 in range(2):
        words.append(
            f"CAST(list_sum(list_transform(range(0, 32), i -> CASE WHEN"
            f" CAST({tbl}.embedding AS DOUBLE[])[i + {32 * w0} + 1] >= 0"
            f" THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
        )
    return ", ".join(f"{expr} AS w{j}" for j, expr in enumerate(words))


def _bin_recall_sql() -> str:
    exact = _registry_mod._REGISTRY["q_knn_join"].sql
    return f"""
    WITH sig AS (
      SELECT e.vec_id, {_sign_words_sql('e')} FROM embeddings e
    ), ranked AS (
      SELECT q_id, vec_id AS neighbor_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY bit_count(xor(c.w0, q.w0)) + bit_count(xor(c.w1, q.w1)),
                          c.vec_id) AS rn
        FROM sig q JOIN sig c ON c.vec_id <> q.vec_id
        WHERE q.vec_id <= {KNN_QUERIES}
      ) WHERE rn <= {KNN_K}
    ), exact AS (
      SELECT q_id, neighbor_id FROM ({exact}) ie
    )
    SELECT e.q_id, CAST(count(r.neighbor_id) AS BIGINT) AS n_hits,
           CAST((count(r.neighbor_id) * 100) // {KNN_K} AS BIGINT) AS recall_pct
    FROM exact e
    LEFT JOIN ranked r ON r.q_id = e.q_id AND r.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    ORDER BY e.q_id
    """


@register("q_binary_hamming_recall", sql=_bin_recall_sql())
def q_binary_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-embedding storage question, answered exactly: sign-bit
    binarization packs each 64-dim vector into two 32-bit words (32x
    smaller); per-query recall of Hamming-distance retrieval vs the
    exact cosine top-5 (composed oracle, full hash check).

    The two words pack 32 bits each — the portable-bitmap rule (never
    touch the int64 sign bit) applied to sign-LSH; Hamming ranking is
    bit_count(XOR) + bit_count(XOR), pure integer, tie-broken on
    vec_id (ties are the norm in Hamming space — an un-tie-broken
    rank would be nondeterministic on BOTH engines).

    Scale shape: the signature build is one narrow map; ranking is
    the same broadcast-query top-k window as q_knn_join over 16 bytes
    per vector instead of 512."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    emb = F.col("embedding").cast("array<double>")
    word_exprs = []
    for w0 in range(2):
        word_exprs.append(
            F.expr(
                f"aggregate(transform(sequence(0, 31), i -> IF("
                f"element_at(CAST(embedding AS ARRAY<DOUBLE>), i + {32 * w0} + 1) >= 0D,"
                f" shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),"
                f" CAST(0 AS BIGINT), (a, x) -> a + x)"
            ).alias(f"w{w0}")
        )
    sig = e.select("vec_id", *word_exprs)
    q = sig.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = (
        sig.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").alias("hd"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("hd"), F.asc("vec_id"))
    ranked = (
        ham.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
        .withColumn("hit", F.lit(1))
    )
    exact = q_knn_join(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        exact.join(ranked, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").cast("long").alias("n_hits"))
        .select(
            "q_id",
            "n_hits",
            F.expr(f"CAST((n_hits * 100) div {KNN_K} AS BIGINT)").alias("recall_pct"),
        )
        .orderBy("q_id")
    )


# ------------------------------------------------------------ MaxSim

_MS_SUB = 4  # subvectors per embedding (late-interaction "tokens")
_MS_SD = 16  # dims per subvector


def _ms_dot_duck(i: int, j: int) -> str:
    return (
        f"list_reduce(list_transform(range(1, {_MS_SD + 1}),"
        f" k -> q.emb[{_MS_SD * i} + k] * c.emb[{_MS_SD * j} + k]),"
        f" (x, y) -> x + y)"
    )


def _ms_dot_spark(i: int, j: int) -> str:
    return (
        f"aggregate(transform(sequence(1, {_MS_SD}),"
        f" k -> element_at(qemb, {_MS_SD * i} + k) * element_at(emb, {_MS_SD * j} + k)),"
        f" CAST(0.0 AS DOUBLE), (x, y) -> x + y)"
    )


def _ms_score(dot_fn) -> str:
    gs = [
        "greatest(" + ", ".join(dot_fn(i, j) for j in range(_MS_SUB)) + ")"
        for i in range(_MS_SUB)
    ]
    return f"((({gs[0]} + {gs[1]}) + {gs[2]}) + {gs[3]})"


def _maxsim_sql() -> str:
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS q_id, c.vec_id,
             CAST(floor(({_ms_score(_ms_dot_duck)}) * CAST(1e6 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS score_e6
      FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
      WHERE q.vec_id <= {KNN_QUERIES}
    )
    SELECT q_id, vec_id AS neighbor_id, score_e6, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, score_e6,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score_e6 DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {KNN_K}
    ORDER BY q_id, rank
    """


@register("q_maxsim_retrieval", sql=_maxsim_sql())
def q_maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style) retrieval: each embedding is
    treated as 4 x 16-dim sub-token vectors and scored by MaxSim —
    sum over query subvectors of the best-matching document subvector
    dot product — the retrieval family between single-vector cosine
    and full cross-encoders.

    Exactness: every subvector dot is the zero-seeded fold (bridged to
    DuckDB's first-element-seeded list_reduce by (0.0 + x) == x), max
    and the 4-term sum use one fixed parenthesization on both engines,
    and the score integerizes before ranking — full hash oracle with
    no transcendental anywhere.

    Scale shape: broadcast query set x one corpus pass (16 dots per
    pair instead of 1 — the late-interaction cost model), per-query
    top-k window; at 100 TB the candidate generation step is an ANN
    prefilter (q_ann_ivf) feeding this exact reranker."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    q = vecs.where(F.col("vec_id") <= KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("qemb")
    )
    scored = (
        vecs.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(
                f"CAST(floor(({_ms_score(_ms_dot_spark)}) * CAST(1e6 AS DOUBLE)"
                f" + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("score_e6"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "score_e6",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("q_id", "rank")
    )


# ------------------------------------------- graph-ANN recall eval (r10)

_GRAPH_RECALL_SQL = f"""
    WITH approx AS (
      SELECT q_id, neighbor_id
      FROM ({_registry_mod._REGISTRY["q_ann_graph_serve"].sql}) ga
    ), exact AS (
      SELECT q_id, neighbor_id
      FROM ({_registry_mod._REGISTRY["q_knn_join"].sql}) ge
    ), hits AS (
      SELECT e.q_id, count(a.neighbor_id) AS n_hits
      FROM exact e
      LEFT JOIN approx a ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
      GROUP BY e.q_id
    )
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST((n_hits * 100) // {KNN_K} AS BIGINT) AS recall_pct
    FROM hits ORDER BY q_id
"""


@register("q_ann_graph_recall", sql=_GRAPH_RECALL_SQL)
def q_ann_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the served bucket-seeded graph ANN against exact
    brute-force cosine k-NN — the acceptance gate for the graph tier,
    hash-oracled by composing the two registered twins as CTEs (the
    q_ann_recall pattern).  Completes the per-tier recall ladder:
    IVF (q_ann_recall), IVF-PQ+refine (q_ann_ivfpq_recall), trained
    PQ (q_ann_pq_trained_recall), graph (this key)."""
    a = q_ann_graph_serve.__wrapped__(spark, sf_dir).select(
        "q_id", "neighbor_id"
    ).withColumn("hit", F.lit(1))
    ex = q_knn_join.__wrapped__(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        ex.join(a, ["q_id", "neighbor_id"], "left")
        .groupBy("q_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "q_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"CAST((n_hits * 100) div {KNN_K} AS BIGINT)").alias("recall_pct"),
        )
        .orderBy("q_id")
    )


# ---------------------------------------------------- SemDeDup (r11)

# ε for the within-cell near-duplicate ball, in int64 micro-units² of
# the +2-shifted micro-unit space (≈ 1.14 L2 in raw embedding units —
# calibrated on the fixture so ~15% of vectors fall in a lower-id
# ball at BOTH sf0.001 and sf0.01; data-dependent thresholds must be
# gated at sf0.01, CLAUDE.md).
SEMDEDUP_EPS = 1_300_000_000_000

# The SemDeDup cells ARE the q_ann_ivf_kmeans cells — the shared
# training/assignment chain is interpolated from the single module
# constant (no hand-kept duplicate to drift, ADVICE r11).
_SEMDEDUP_ASSIGN = _IVFK_TRAIN_ASSIGN

_SEMDEDUP_SQL = f"""
    WITH {_SEMDEDUP_ASSIGN}, near AS (
      SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
      FROM assign a
      JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN vecs p ON p.vec_id = a.vec_id
      JOIN vecs q ON q.vec_id = b.vec_id
      WHERE list_reduce(list_transform(range(1, len(p.vm) + 1),
                 i -> (p.vm[i] - q.vm[i]) * (p.vm[i] - q.vm[i])),
              (acc, x) -> acc + x) <= {SEMDEDUP_EPS}
      GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           CAST(CASE WHEN n.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
           CAST(COALESCE(n.dup_of, -1) AS BIGINT) AS dup_of
    FROM assign s LEFT JOIN near n ON n.vec_id = s.vec_id
    """


@register("q_semdedup", sql=_SEMDEDUP_SQL)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    clustering + within-cluster ε-ball pruning.  Vectors are assigned
    to the q_ann_ivf_kmeans trained cells (shared CTE prefix — one
    training contract), then within each cell any vector with a
    LOWER-ID neighbor inside ε is dropped (the chain's lowest-id
    member survives — the deterministic spelling of the paper's
    keep-one-per-duplicate-group rule).  Emits one verdict row per
    vector: (vec_id, cell, kept, dup_of).

    All-integer (micro-unit vectors, int64 squared-L2, integer
    centroid means) → full hash oracle THROUGH the k-means round.

    Scale: the pair stage is within-cell only — O(Σ cell²), and the
    registered key now DERIVES nlist = max(IVFK_NLIST,
    n // TARGET_CELL) from the corpus count (r12 — the rule APPLIED,
    closing VERDICT r11 wrong #1) so per-cell occupancy is constant
    and total pair work is LINEAR in the corpus with no manual knob;
    that bound is the entire point of clustering before comparing
    (same blocking role as the LSH bands in q_dedup_minhash_md5).
    Measured on the jittered N× layout (tools/ann_bits_probe.py,
    SCALE.md r11–r13): nlist frozen at 8 runs 2,321 s at 64× —
    occupancy² pair work AND parallelism capped at 8 cells — the r12
    derived default (flat train + rp1 assign) ran 62–69 s, and the
    r13 default (BOTH argmins routed multi-probe at
    rprobe=TWOLEVEL_RPROBE_PAIR past TWOLEVEL_MIN_NLIST) runs
    **31–38 s** at better quality (124,173 vs 122,560 dropped of the
    exact 126,579; Σocc² 46.0M vs flat 36.4M).  At index-backed
    deployments even the assign vanishes — reuse the persisted IVF
    assignments (build_ivf_kmeans_index) instead of re-assigning
    (q_semdedup_serve)."""
    return semdedup_verdicts(spark, sf_dir)


def semdedup_verdicts(
    spark: SparkSession,
    sf_dir: str,
    nlist: int | None = None,
    eps: int = SEMDEDUP_EPS,
    two_level: bool | None = None,
    train_two_level="same",
    rprobe: int = TWOLEVEL_RPROBE_PAIR,
    pair_impl: str | None = None,
) -> DataFrame:
    """Parameterized SemDeDup (the q_semdedup pipeline with the nlist
    and ε knobs exposed): nlist DERIVES from the corpus by default
    (max(IVFK_NLIST, n // TARGET_CELL) — VERDICT r11 missing #2) so the
    within-cell pair stage stays linear with no manual knob; past
    TWOLEVEL_MIN_NLIST cells BOTH argmins route through the
    multi-probe two-level quantizer at rprobe=TWOLEVEL_RPROBE_PAIR
    (r13 — the balance-aware routing VERDICT r12 next #2 asked for).
    Defaults reproduce the registered key exactly at every fixture
    scale (derived nlist = IVFK_NLIST there → flat branch).
    ``train_two_level="same"`` routes training like the assign; the
    pinned proof keys pass explicit values (q_semdedup_twolevel: flat
    train + rprobe=1 assign, the r12 math; q_semdedup_rprobe: routed
    rprobe=3 end-to-end, the r13 scale math).  ``pair_impl`` (r15)
    selects the ε-pair stage: None = auto (numpy kernel past
    TWOLEVEL_MIN_NLIST, Catalyst join at every fixture scale)."""
    nlist = derived_nlist(spark, sf_dir) if nlist is None else nlist
    return _semdedup_from_assign(
        _semdedup_assign_frame(
            spark, sf_dir, nlist, two_level, train_two_level, rprobe
        ),
        eps,
        pair_impl=pair_impl,
        nlist=nlist,
    )


def _semdedup_assign_frame(
    spark: SparkSession,
    sf_dir: str,
    nlist: int | None = None,
    two_level: bool | None = None,
    train_two_level="same",
    rprobe: int = TWOLEVEL_RPROBE_PAIR,
) -> DataFrame:
    """PERSISTED (vec_id, cell, vm) assignment over the trained cells —
    the shared entry of the SemDeDup family.  Every consumer reads the
    assignment at least twice (both pair sides, plus the verdict
    left-join base in q_semdedup), so the assign pass is persisted
    once here instead of recomputed per reader (ADVICE r11).  nlist
    derives from the corpus by default.

    Routing policy history: r12 kept training flat (rp1 routing
    concentrated occupancy — Σocc² 124.7M vs 36.4M flat at 64×); r13
    routed BOTH argmins multi-probe at rprobe=TWOLEVEL_RPROBE_PAIR
    (Σocc² 46.0M at 18% of the flat CATALYST argmin's distance work);
    r14 made auto EXACT again below NUMPY_FLAT_MAX_NLIST — the numpy
    matmul runs the flat argmin faster than routing ever did (13.4 s
    vs 28.6–35.8 s end-to-end at 64×, dropped 126,579 exact vs
    124,173) with perfectly balanced cells (Σocc² 36.4M).  ``rprobe``
    now matters only past the matrix ceiling or on the forced-routed
    pinned keys.  Measured: SCALE.md r12–r14."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", _micro_arr("embedding").alias("vm"))
    nlist = derived_nlist(spark, sf_dir) if nlist is None else nlist
    ttl = two_level if train_two_level == "same" else train_two_level
    cents = _ivfk_cents(vecs, nlist, ttl, rprobe)
    return scoped_persist(
        _assign_cells(vecs, cents, nlist, two_level, rprobe=rprobe)
    )


def _cell_pair_kernel(eps: int, mode: str):
    """Per-cell ε-pair scan as a grouped numpy kernel (r15, VERDICT
    r14 next #3 — the most expensive surviving path: the Catalyst
    pair join evaluates a d-dim zip_with fold per candidate pair,
    ~Σocc² of them).  Exactness: distances use the decomposed float64
    form whose every intermediate is an integer below 2^53
    (_assert_sub53 — the same proof as every numpy assign path), so
    the pair SET is bit-identical to _int_sqdist's.  Norm-band
    pruning: rows sort by ‖x‖ and a row block only meets columns
    within sqrt(eps) of its norm range — |‖x‖−‖y‖| > sqrt(eps) ⟹
    ‖x−y‖² > eps (reverse triangle inequality), so pruned pairs are
    provably outside the ball; the float margin (+1e-3 micro-units on
    a bound whose abs error is ≤ ~1e-8) only ever widens the band.
    Work per cell is O(occ · band_occ · d) BLAS instead of Σocc²
    interpreted folds — sublinear in occ² whenever norms spread.

    ``mode``: "pairs" emits every (src=lower id, dst=higher id) ε-pair
    (the CC consumer); "min" emits (vec_id, dup_of = min lower-id
    in-ball neighbor) only for duped vectors — the verdict consumer's
    ``near`` aggregate computed in-kernel, so no pair-sized shuffle
    ever leaves the task."""
    import numpy as np

    thr = float(eps) ** 0.5 + 1e-3

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        cols = (
            ("src", "dst") if mode == "pairs" else ("vec_id", "dup_of")
        )
        if n < 2:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        X = np.stack(pdf["vm"].to_numpy()).astype(np.float64)
        _assert_sub53(X)
        x2 = (X * X).sum(axis=1)
        s = np.sqrt(x2)
        o = np.argsort(s, kind="stable")
        ids, X, x2, s = ids[o], X[o], x2[o], s[o]
        lo_parts, hi_parts = [], []
        dup = np.full(n, np.iinfo(np.int64).max) if mode == "min" else None
        for a in range(0, n, 1024):
            b = min(a + 1024, n)
            lo = int(np.searchsorted(s, s[a] - thr, side="left"))
            hi = int(np.searchsorted(s, s[b - 1] + thr, side="right"))
            D = (
                x2[a:b, None]
                + x2[None, lo:hi]
                - 2.0 * (X[a:b] @ X[lo:hi].T)
            )
            ii, jj = np.nonzero(D <= eps)
            gi, gj = ii + a, jj + lo
            m = ids[gi] < ids[gj]  # one orientation per pair, no self
            gi, gj = gi[m], gj[m]
            if mode == "min":
                np.minimum.at(dup, gj, ids[gi])
            else:
                lo_parts.append(ids[gi])
                hi_parts.append(ids[gj])
        if mode == "min":
            hit = dup < np.iinfo(np.int64).max
            return pd.DataFrame(
                {"vec_id": ids[hit], "dup_of": dup[hit]}
            ).astype("int64")
        src = np.concatenate(lo_parts) if lo_parts else np.empty(0, np.int64)
        dst = np.concatenate(hi_parts) if hi_parts else np.empty(0, np.int64)
        return pd.DataFrame({"src": src, "dst": dst}).astype("int64")

    return fn


def _semdedup_pairs(
    assign: DataFrame, eps: int, impl: str | None = None, nlist: int | None = None
) -> DataFrame:
    """Within-cell ε-pairs (src = lower id, dst = higher id) over an
    (vec_id, vm, cell) assignment — the stage every SemDeDup consumer
    shares.  ``impl`` None = auto: the grouped numpy kernel past
    TWOLEVEL_MIN_NLIST cells (the same gate as the assign policy — at
    every fixture scale derived nlist = IVFK_NLIST keeps the Catalyst
    join, so declared plans are untouched below the derived-nlist
    regime), the Catalyst join otherwise.  Pair-set equality between
    the impls is pinned by tests/test_semdedup_pair_kernel.py.
    Measured at 64×/nlist=511 (SCALE.md r15,
    tools/semdedup_pair_probe.py): verdicts e2e 22.8/14.5 s →
    5.2/7.1 s (~3×), clusters e2e 27.0/27.0 s → 16.9/19.3 s (~1.5× —
    CC + assign dominate the rest); the kernel ships each assignment
    row ONCE (one groupBy exchange) where the join shuffled both
    sides, and the norm band skips provably-outside pairs."""
    if impl is None:
        impl = (
            "numpy"
            if nlist is not None and nlist >= TWOLEVEL_MIN_NLIST
            else "catalyst"
        )
    if impl == "numpy":
        return (
            assign.select("cell", "vec_id", "vm")
            .groupBy("cell")
            .applyInPandas(_cell_pair_kernel(eps, "pairs"), "src long, dst long")
        )
    a = assign.select(
        "cell", F.col("vec_id").alias("va"), F.col("vm").alias("vma")
    )
    b = assign.select("cell", "vec_id", F.col("vm").alias("vmb"))
    return (
        a.join(b, "cell")
        .where(F.col("va") < F.col("vec_id"))
        .where(_int_sqdist(F.col("vma"), F.col("vmb")) <= F.lit(eps))
        .select(F.col("va").alias("src"), F.col("vec_id").alias("dst"))
    )


def _semdedup_from_assign(
    assign: DataFrame,
    eps: int,
    pair_impl: str | None = None,
    nlist: int | None = None,
) -> DataFrame:
    """Pair + verdict stages over an (vec_id, vm, cell) assignment
    frame — shared by the in-plan key (computed assign, persisted)
    and the index-backed serve twin (parquet assign, NOT persisted:
    three cheap pruned scans fuse into their own stages, the r8
    persist adjudication rule).  ``pair_impl``/``nlist`` select the
    pair stage (r15): auto keeps the Catalyst join below
    TWOLEVEL_MIN_NLIST cells (every fixture-scale declared plan) and
    runs the grouped numpy ε-kernel past it, emitting the ``near``
    aggregate in-kernel (mode "min") so no pair-sized shuffle exists
    at scale."""
    if pair_impl is None:
        pair_impl = (
            "numpy"
            if nlist is not None and nlist >= TWOLEVEL_MIN_NLIST
            else "catalyst"
        )
    if pair_impl == "numpy":
        near = (
            assign.select("cell", "vec_id", "vm")
            .groupBy("cell")
            .applyInPandas(
                _cell_pair_kernel(eps, "min"), "vec_id long, dup_of long"
            )
        )
    else:
        a = assign.select(
            "cell", F.col("vec_id").alias("va"), F.col("vm").alias("vma")
        )
        b = assign.select("cell", "vec_id", F.col("vm").alias("vmb"))
        near = (
            a.join(b, "cell")
            .where(F.col("va") < F.col("vec_id"))
            .where(_int_sqdist(F.col("vma"), F.col("vmb")) <= F.lit(eps))
            .groupBy("vec_id")
            .agg(F.min("va").alias("dup_of"))
        )
    return (
        assign.join(near, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.when(F.col("dup_of").isNull(), 1).otherwise(0).cast("long").alias("kept"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long").alias("dup_of"),
        )
    )


@register("q_semdedup_serve", sql=_SEMDEDUP_SQL)
def q_semdedup_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup served from the persisted trained-centroid IVF index:
    read build_ivf_kmeans_index's materialized (vec_id, vm, cell)
    assignments instead of re-running the O(n·nlist) assign crossJoin
    — the deployment shape the SCALE.md r11 probe points at (the
    re-parameterized path's residual cost is the assign; an
    index-backed run pays zero, because the ANN build already wrote
    the identical assignment).  Shares the rebuild twin's oracle, so
    the hash certifies both the parquet round trip and the derivation
    contract between the ANN index and the dedup family.  Read schema
    pinned (fmt-3 assignments carry a label column this key never
    uses — the q_bm25_serve rule)."""
    import os

    path = build_ivf_kmeans_index(spark, sf_dir)
    assign = spark.read.schema("vec_id bigint, vm array<bigint>, cell int").parquet(
        os.path.join(path, "assignments")
    )
    return _semdedup_from_assign(
        assign, SEMDEDUP_EPS, nlist=derived_nlist(spark, sf_dir)
    )


_SEMDEDUP_STATS_SQL = f"""
    WITH sd AS ({_SEMDEDUP_SQL})
    SELECT cell,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped
    FROM sd GROUP BY cell
    """


@register("q_semdedup_stats", sql=_SEMDEDUP_STATS_SQL)
def q_semdedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell SemDeDup retention report (the number a curation run
    actually monitors: how much each semantic cluster shrank).
    Composes q_semdedup's full oracle as a CTE (the registered-oracles-
    compose pattern) — the hash certifies the whole pipeline again."""
    sd = q_semdedup.__wrapped__(spark, sf_dir)
    return sd.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("kept").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("kept")).cast("long").alias("n_dropped"),
    )


_SEMDEDUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_SEMDEDUP_ASSIGN}, prs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM assign a
      JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN vecs p ON p.vec_id = a.vec_id
      JOIN vecs q ON q.vec_id = b.vec_id
      WHERE list_reduce(list_transform(range(1, len(p.vm) + 1),
                 i -> (p.vm[i] - q.vm[i]) * (p.vm[i] - q.vm[i])),
              (acc, x) -> acc + x) <= {SEMDEDUP_EPS}
    ), edges AS (
      SELECT va AS a, vb AS b FROM prs
      UNION
      SELECT vb, va FROM prs
    ), reach(src, dst) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src
    """


@register("q_semdedup_clusters", sql=_SEMDEDUP_CLUSTERS_SQL)
def q_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-duplicate CLUSTERS: connected components over the
    within-cell ε-graph — the semantic mirror of q_dedup_clusters
    (pairs alone over-remove: A~B, B~C must keep exactly one of
    {A,B,C}; q_semdedup's lowest-id greedy approximates this, the
    component closure is exact).  Spark side reuses the O(log n)
    large-star/small-star CC (graph.connected_components) over the
    ε-pairs, with the pair pipeline localCheckpoint'ed once before
    the loop; the oracle closes the SAME pair set with a recursive
    CTE on top of the shared k-means assignment CTEs.  Output: one
    row per vector that participates in any ε-pair, cluster_id =
    component minimum.  Scale: pairs are within-cell (linear under
    the nlist ∝ n rule, SCALE.md r11); CC rounds are O(log n) with
    edge count bounded by the pair output."""
    from processor_spark.operators.graph import connected_components

    # both pair sides read the assignment — the shared helper persists
    # the O(n·nlist) assign pass once (ADVICE r11); the pair stage is
    # the shared _semdedup_pairs (r15: grouped numpy ε-kernel past
    # TWOLEVEL_MIN_NLIST, Catalyst join at every fixture scale)
    assign = _semdedup_assign_frame(spark, sf_dir)
    pairs = _semdedup_pairs(
        assign, SEMDEDUP_EPS, nlist=derived_nlist(spark, sf_dir)
    ).localCheckpoint(eager=True)
    return connected_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


_PRUNE_PROTO_SQL = f"""
    WITH {_IVFK_TRAIN_ASSIGN}, d2 AS (
      SELECT a.vec_id, a.cell,
             list_reduce(list_transform(range(1, len(v.vm) + 1),
                  i -> (v.vm[i] - c.cm[i]) * (v.vm[i] - c.cm[i])),
               (acc, x) -> acc + x) AS sq
      FROM assign a
      JOIN vecs v ON v.vec_id = a.vec_id
      JOIN cents c ON c.cid = a.cell
    ), ranked AS (
      SELECT vec_id, cell, sq,
             row_number() OVER (PARTITION BY cell ORDER BY sq, vec_id) AS proto_rank,
             count(*) OVER (PARTITION BY cell) AS n_cell
      FROM d2
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell,
           CAST(sq AS BIGINT) AS sq_micro2,
           CAST(proto_rank AS BIGINT) AS proto_rank,
           CAST(CASE WHEN proto_rank <= (n_cell + 4) // 5 THEN 0 ELSE 1 END
                AS BIGINT) AS kept
    FROM ranked
    """


@register("q_prune_prototypes", sql=_PRUNE_PROTO_SQL)
def q_prune_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): rank each vector by its distance to its
    k-means cell centroid — the most PROTOTYPICAL (closest, most
    redundant) examples prune first; here the closest ceil(20%) of
    each cell is dropped (kept = 0).  Rides the family's shared
    training contract (same cells as q_ann_ivf_kmeans / q_semdedup),
    so curation can compose it with the SemDeDup verdict at zero
    extra training cost.  Emits (vec_id, cell, sq_micro2, proto_rank,
    kept) — all integer (exact squared-L2 to the integer centroid,
    integer ceil via (n+4) div 5), full hash oracle through the
    training round.  Scale: one broadcast join to the nlist×d
    centroid table plus per-cell windows, occupancy-bounded under the
    derived-nlist rule — no corpus-sized sort anywhere; with no pair
    stage to pay the balance trade, training routes two-level past
    the threshold like the IVF family (auto), flat at every
    oracle-checked scale."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    vecs = e.select("vec_id", _micro_arr("embedding").alias("vm"))
    nlist = derived_nlist(spark, sf_dir)
    cents = _ivfk_cents(vecs, nlist)
    assign = _assign_cells(vecs, cents, nlist)
    d2 = assign.join(
        F.broadcast(cents), assign["cell"] == cents["cid"]
    ).select(
        "vec_id", "cell", _int_sqdist(F.col("vm"), F.col("cm")).alias("sq")
    )
    wr = Window.partitionBy("cell").orderBy("sq", "vec_id")
    wc = Window.partitionBy("cell")
    return (
        d2.withColumn("proto_rank", F.row_number().over(wr))
        .withColumn("n_cell", F.count(F.lit(1)).over(wc))
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.col("sq").cast("long").alias("sq_micro2"),
            F.col("proto_rank").cast("long").alias("proto_rank"),
            F.when(
                F.col("proto_rank") <= F.expr("(n_cell + 4) div 5"), 0
            ).otherwise(1).cast("long").alias("kept"),
        )
    )


@register("q_semdedup_clusters_serve", sql=_SEMDEDUP_CLUSTERS_SQL)
def q_semdedup_clusters_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-graph components served from the persisted trained-centroid
    IVF index (r12): read build_ivf_kmeans_index's materialized
    (vec_id, vm, cell) assignments instead of re-running the Lloyd +
    assign passes — the q_semdedup_serve pattern one rung up (pairs +
    O(log n) CC over parquet scans; plan-asserted crossJoin-free in
    tests/test_plans.py).  Shares the rebuild twin's oracle, so the
    hash certifies the index round trip THROUGH the component
    closure.  Read schema pinned (fmt-3 assignments carry a label
    column this key never uses)."""
    import os

    from processor_spark.operators.graph import connected_components

    path = build_ivf_kmeans_index(spark, sf_dir)
    assign = spark.read.schema("vec_id bigint, vm array<bigint>, cell int").parquet(
        os.path.join(path, "assignments")
    )
    pairs = _semdedup_pairs(
        assign, SEMDEDUP_EPS, nlist=derived_nlist(spark, sf_dir)
    ).localCheckpoint(eager=True)
    return connected_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


# ---------------------- two-level coarse quantizer, hash-oracled (r12)


def _dist_sql(a: str, b: str) -> str:
    """The module's canonical integer squared-L2 as DuckDB text — the
    byte-identical expression tree every trained-centroid oracle
    uses."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1),\n"
        f"                  i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])),\n"
        f"               (acc, x) -> acc + x)"
    )


# Assignment-only routing CTEs (ride the shared FLAT-train prefix's
# cents): cseeds/cgrp/vg/a2 — the r12 SemDeDup shape (flat training +
# rprobe=1 routed assign), PINNED by q_semdedup_twolevel.  Policy
# history: the r13 default routed BOTH argmins multi-probe
# (rprobe=TWOLEVEL_RPROBE_PAIR — see _twolevel_rprobe_ctes /
# q_semdedup_rprobe); the r14 default is EXACT flat again below
# NUMPY_FLAT_MAX_NLIST (the numpy argmin outruns the router — its
# table) with multi-probe routing past the ceiling.  This text stays
# as the r12 proof key's exact oracle.
_TWOLEVEL_ASSIGN_CTES = f"""p AS (
      SELECT greatest(1, CAST(floor(sqrt(greatest({IVFK_NLIST},
               count(*) // {TARGET_CELL}))) AS BIGINT)) AS nc
      FROM vecs
    ), cseeds AS (
      SELECT cid AS gid, cm AS gm FROM cents
      QUALIFY row_number() OVER (ORDER BY cid) <= (SELECT nc FROM p)
    ), cgrp AS (
      SELECT cid, cm, gid FROM (
        SELECT c.cid, c.cm, g.gid, {_dist_sql('c.cm', 'g.gm')} AS gsq
        FROM cents c CROSS JOIN cseeds g)
      QUALIFY row_number() OVER (PARTITION BY cid ORDER BY gsq, gid) = 1
    ), vg AS (
      SELECT vec_id, vm, gid FROM (
        SELECT v.vec_id, v.vm, g.gid, {_dist_sql('v.vm', 'g.gm')} AS gsq
        FROM vecs v CROSS JOIN cseeds g)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY gsq, gid) = 1
    ), a2 AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT v.vec_id, c.cid, {_dist_sql('v.vm', 'c.cm')} AS sq
        FROM vg v JOIN cgrp c USING (gid))
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    )"""

# Two-level CTE chain, routed END-TO-END (r12): both O(n·nlist)
# argmins — the Lloyd seeds pass AND the final assignment — go
# through the ncoarse = isqrt(nlist) router (the 64× breakdown
# measured the flat Lloyd pass at 45.0 s of the 49 s build once the
# assign alone was routed).  tseeds/tgrp/tvg/a0 route the TRAINING
# argmin over the seed table; cseeds/cgrp/vg/a2 route the assignment
# over the trained centroids.  Exactly _assign_cells' two-level
# branch applied to each stage, tie-breaks included.  The IVF serve
# family's shape — probe-bounded serving, no pair stage, so rprobe=1
# suffices (recall 1.0 measured); pair-stage families widen the probe
# instead (TWOLEVEL_RPROBE_PAIR, r13 — see _twolevel_rprobe_ctes).
_TWOLEVEL_FULL_CTES = f"""vecs AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), p AS (
      SELECT greatest(1, CAST(floor(sqrt(greatest({IVFK_NLIST},
               count(*) // {TARGET_CELL}))) AS BIGINT)) AS nc
      FROM vecs
    ), seeds AS (
      SELECT vec_id AS cid, vm AS cm FROM vecs
      WHERE vec_id < (SELECT greatest({IVFK_NLIST}, count(*) // {TARGET_CELL})
                      FROM vecs)
    ), tseeds AS (
      SELECT cid AS gid, cm AS gm FROM seeds
      QUALIFY row_number() OVER (ORDER BY cid) <= (SELECT nc FROM p)
    ), tgrp AS (
      SELECT cid, cm, gid FROM (
        SELECT s.cid, s.cm, g.gid, {_dist_sql('s.cm', 'g.gm')} AS gsq
        FROM seeds s CROSS JOIN tseeds g)
      QUALIFY row_number() OVER (PARTITION BY cid ORDER BY gsq, gid) = 1
    ), tvg AS (
      SELECT vec_id, vm, gid FROM (
        SELECT v.vec_id, v.vm, g.gid, {_dist_sql('v.vm', 'g.gm')} AS gsq
        FROM vecs v CROSS JOIN tseeds g)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY gsq, gid) = 1
    ), a0 AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, s.cid, {_dist_sql('v.vm', 's.cm')} AS sq
        FROM tvg v JOIN tgrp s USING (gid))
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), elems AS (
      SELECT a.cid, unnest(range(1, len(v.vm) + 1)) AS pos, unnest(v.vm) AS m
      FROM a0 a JOIN vecs v USING (vec_id)
    ), cmeans AS (
      SELECT cid, pos, CAST(sum(m) AS BIGINT) // count(*) AS nm
      FROM elems GROUP BY cid, pos
    ), cents AS (
      SELECT cid, list(nm ORDER BY pos) AS cm FROM cmeans GROUP BY cid
    ), cseeds AS (
      SELECT cid AS gid, cm AS gm FROM cents
      QUALIFY row_number() OVER (ORDER BY cid) <= (SELECT nc FROM p)
    ), cgrp AS (
      SELECT cid, cm, gid FROM (
        SELECT c.cid, c.cm, g.gid, {_dist_sql('c.cm', 'g.gm')} AS gsq
        FROM cents c CROSS JOIN cseeds g)
      QUALIFY row_number() OVER (PARTITION BY cid ORDER BY gsq, gid) = 1
    ), vg AS (
      SELECT vec_id, vm, gid FROM (
        SELECT v.vec_id, v.vm, g.gid, {_dist_sql('v.vm', 'g.gm')} AS gsq
        FROM vecs v CROSS JOIN cseeds g)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY gsq, gid) = 1
    ), a2 AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT v.vec_id, c.cid, {_dist_sql('v.vm', 'c.cm')} AS sq
        FROM vg v JOIN cgrp c USING (gid))
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    )"""

_IVF2_SQL = f"""
    WITH {_TWOLEVEL_FULL_CTES}, d1q AS (
      SELECT v.vec_id, c.cid, {_dist_sql('v.vm', 'c.cm')} AS sq
      FROM vecs v CROSS JOIN cents c WHERE v.vec_id <= {KNN_QUERIES}
    ), probes AS (
      SELECT vec_id AS q_id, cid AS cell FROM d1q
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) <= {IVF_NPROBE}
    ), scored AS (
      SELECT p.q_id, a.vec_id,
             {_dist_sql('q.vm', 't.vm')} AS sq
      FROM probes p
      JOIN a2 a ON a.cell = p.cell
      JOIN vecs q ON q.vec_id = p.q_id
      JOIN vecs t ON t.vec_id = a.vec_id
      WHERE a.vec_id <> p.q_id
    )
    SELECT q_id, vec_id AS neighbor_id,
           CAST(sq AS BIGINT) AS sq_micro2, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT q_id, vec_id, sq,
             row_number() OVER (PARTITION BY q_id ORDER BY sq, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {KNN_K}
    """


@register("q_ann_ivf_twolevel", sql=_IVF2_SQL)
def q_ann_ivf_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the TWO-LEVEL coarse-quantized corpus assignment
    forced on at fixture scale — the cross-engine proof of the math
    the parameterized builders auto-switch to past TWOLEVEL_MIN_NLIST
    cells (VERDICT r11 missing #1).  With nlist ∝ n the flat assign
    is O(n²/TARGET_CELL) total work; routing through ncoarse =
    isqrt(nlist) coarse cells restores O(n·2·sqrt(nlist)) and removes
    the corpus × full-centroid-table crossJoin from the plan (the
    fine stage is an equi-join on the router cell — plan-asserted in
    tests/test_plans.py).  BOTH O(n·nlist) argmins route: the Lloyd
    seed pass (the 64× breakdown measured it at 45.0 s of the 49 s
    assign-only-routed build) and the final assignment.  Assignment
    is approximate (a vector whose true nearest centroid lives in
    another router group lands in its routed group's best cell
    instead); probes still rank cells exactly (|Q| × nlist is
    trivial).  Measured at 64×/nlist=512 (SCALE.md r12 session 2):
    flat 79.2 s → routed 10.3 s (7.7×) at recall@5 = 1.0 on both
    rows; the no-knob derived default runs 8.8 s.  All-integer as
    ever: full hash oracle through training, routing, assignment,
    probing and ranking."""
    return ivf_kmeans_topk(spark, sf_dir, two_level=True)


_SEMDEDUP2_SQL = f"""
    WITH {_IVFK_TRAIN_ASSIGN}, {_TWOLEVEL_ASSIGN_CTES}, near AS (
      SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
      FROM a2 a
      JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN vecs p ON p.vec_id = a.vec_id
      JOIN vecs q ON q.vec_id = b.vec_id
      WHERE {_dist_sql('p.vm', 'q.vm')} <= {SEMDEDUP_EPS}
      GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           CAST(CASE WHEN n.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
           CAST(COALESCE(n.dup_of, -1) AS BIGINT) AS dup_of
    FROM a2 s LEFT JOIN near n ON n.vec_id = s.vec_id
    """


@register("q_semdedup_twolevel", sql=_SEMDEDUP2_SQL)
def q_semdedup_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the two-level coarse-quantized ASSIGN forced on —
    the dedup-family twin of q_ann_ivf_twolevel, hash-oracled through
    the router so the scale path (derived nlist ≥ TWOLEVEL_MIN_NLIST
    auto-routes) has fixture-scale cross-engine proof.  Unlike the
    IVF twin, TRAINING stays flat: the pair stage is occupancy² and
    routed training trades cell balance for build speed (Σocc² 36.4M
    → 124.7M, pairs 10.6 → 75.2 s at 64× — SCALE.md r12 session 2),
    so only the assign argmin routes.  Verdict semantics are
    q_semdedup's exactly (lowest-id ε-ball survivor per cell) over
    the routed cells; routing changes WHICH cell a boundary vector
    compares within, the same trade every blocked dedup family
    already makes (LSH bands, grid cells).  Measured at 64×/nlist=512
    isolated: 62-69 s vs 83-92 s flat-everything; dedup quality
    122,560 vs 126,579 of 128k dropped (~3% boundary loss — pass
    two_level=False where recall beats wall-clock).

    r13: this key PINS the r12 math (flat train + rprobe=1 routed
    assign — its registered oracle's exact text).  Production default
    history: r13 routed both argmins at rprobe=TWOLEVEL_RPROBE_PAIR
    (proven by q_semdedup_rprobe); r14 runs EXACT numpy-flat below
    NUMPY_FLAT_MAX_NLIST (faster than the router AND exact — its
    table) and routes rp3 only past the ceiling, where
    q_semdedup_rprobe remains the cross-engine proof."""
    return semdedup_verdicts(
        spark, sf_dir, two_level=True, train_two_level=False, rprobe=1
    )


_EMBED_DRIFT_SQL = f"""
    WITH {_SEMDEDUP_ASSIGN}, split AS (
      SELECT cell, CAST(vec_id % 2 AS BIGINT) AS in_b FROM assign
    ), per_cell AS (
      SELECT cell,
             CAST(sum(1 - in_b) AS BIGINT) AS a_cnt,
             CAST(sum(in_b) AS BIGINT) AS b_cnt
      FROM split GROUP BY cell
    ), tot AS (
      SELECT CAST(sum(a_cnt) AS BIGINT) AS n_a,
             CAST(sum(b_cnt) AS BIGINT) AS n_b
      FROM per_cell
    )
    SELECT CAST(p.cell AS BIGINT) AS cell, p.a_cnt, p.b_cnt,
           p.b_cnt * t.n_a - t.n_b * p.a_cnt AS delta_scaled,
           CASE WHEN p.a_cnt = 0 THEN -1
                WHEN t.n_b = 0 THEN 0 ELSE CAST(floor(
             CAST(CAST(p.b_cnt * t.n_a - t.n_b * p.a_cnt AS HUGEINT)
                  * (p.b_cnt * t.n_a - t.n_b * p.a_cnt) AS DOUBLE)
             / CAST(CAST(t.n_a AS HUGEINT) * t.n_b * p.a_cnt AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) END AS contrib_micro
    FROM per_cell p CROSS JOIN tot t
    """


@register("q_embed_drift", sql=_EMBED_DRIFT_SQL)
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift between two corpus slices — the
    fully-oracled BATCH twin of the streaming drift trigger
    (pipelines.run_semdedup_stream_monitored, r13): both monitor the
    same signal, the per-cell occupancy mix over the ONE shared
    k-means training contract (_SEMDEDUP_ASSIGN — the identical CTE
    prefix q_semdedup/q_ann_ivf_kmeans ride).  Slices are the
    even/odd vec_id halves (a deterministic A/B over a common
    binning); each cell reports its χ² contribution with period A as
    the baseline, via q_chi2_drift's exact integer bridge — the
    rational expected count never materializes ((b·n_a − n_b·a)²
    cross-multiplied, numerator squared in 128-bit, snapped to micro
    units per row so no float ever sums across rows), and a cell
    empty in the baseline reports the -1 new-category sentinel
    instead of dividing by zero.  PSI needs log — designed out, same
    decision signal (the CLAUDE.md r4 rule).

    Scale shape: rides the family's persisted assign frame (the
    corpus pass is already paid), then an nlist-row agg + a 1-row
    broadcast of the totals — the drift report itself is free at any
    corpus size."""
    assign = _semdedup_assign_frame(spark, sf_dir).select("vec_id", "cell")
    per_cell = assign.groupBy("cell").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("a_cnt"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("b_cnt"),
    )
    tot = per_cell.agg(
        F.sum("a_cnt").cast("long").alias("n_a"),
        F.sum("b_cnt").cast("long").alias("n_b"),
    )
    j = per_cell.crossJoin(F.broadcast(tot))
    delta = F.col("b_cnt") * F.col("n_a") - F.col("n_b") * F.col("a_cnt")
    dd = delta.cast("decimal(19,0)")
    num = (dd * dd).cast("double")
    den = (
        F.col("n_a").cast("decimal(19,0)")
        * F.col("n_b").cast("decimal(19,0)")
        * F.col("a_cnt").cast("decimal(19,0)")
    ).cast("double")
    return j.select(
        F.col("cell").cast("long").alias("cell"),
        "a_cnt",
        "b_cnt",
        delta.alias("delta_scaled"),
        # n_b = 0 (empty B slice) would make num/den = 0/0 → NaN and
        # floor(NaN)::BIGINT is a data-dependent crash on both engines
        # (ADVICE r13); with n_b = 0 every b_cnt is 0, delta is 0, and
        # the χ² contribution's limit is exactly 0 — emit it directly
        F.when(F.col("a_cnt") == 0, F.lit(-1))
        .when(F.col("n_b") == 0, F.lit(0))
        .otherwise(F.floor(num / den * 1000000 + F.lit(0.5)).cast("long"))
        .alias("contrib_micro"),
    )


_EMBED_DRIFT_SCORE_SQL = f"""
    WITH drift AS ({_EMBED_DRIFT_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(count_if(contrib_micro = -1) AS BIGINT) AS n_new_cells,
           CAST(sum(CASE WHEN contrib_micro = -1 THEN 0
                         ELSE contrib_micro END) AS BIGINT) AS chi2_micro,
           CAST(CASE WHEN sum(CASE WHEN contrib_micro = -1 THEN 0
                                   ELSE contrib_micro END)
                          > 1000000 * (count(*) - 1)
                          OR count_if(contrib_micro = -1) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS drifted
    FROM drift
    """


@register("q_embed_drift_score", sql=_EMBED_DRIFT_SCORE_SQL)
def q_embed_drift_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1-row drift DECISION a monitor actually alerts on: total χ²
    (exact integer sum of q_embed_drift's per-cell micro contributions
    — no cross-row float ever exists), the count of cells absent from
    the baseline slice (a new semantic region is drift by definition),
    and the verdict bit under the documented rule χ² > (k−1)·1e6
    micro-units (the statistic's expectation under the null is ~k−1,
    so this triggers at ~1× the null mean — deliberately sensitive,
    same spirit as the streaming SEMDEDUP_DRIFT_THRESHOLD) OR any new
    cell.  Composes q_embed_drift's full oracle as a CTE (the
    registered-oracles-compose pattern), so the hash certifies the
    entire pipeline — training, assignment, per-cell χ², decision —
    again in one row."""
    d = q_embed_drift.__wrapped__(spark, sf_dir)
    contrib = F.when(F.col("contrib_micro") == -1, F.lit(0)).otherwise(
        F.col("contrib_micro")
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.count_if(F.col("contrib_micro") == -1).cast("long").alias("n_new_cells"),
        F.sum(contrib).cast("long").alias("chi2_micro"),
        F.when(
            (F.sum(contrib) > F.lit(1000000) * (F.count(F.lit(1)) - F.lit(1)))
            | (F.count_if(F.col("contrib_micro") == -1) > 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("drifted"),
    )


def _twolevel_rprobe_ctes(nlist_sub: str, rprobe: int) -> str:
    """Routed train+assign CTE chain parameterized by the nlist scalar
    expression and the router probe width — the multi-probe
    generalization of _TWOLEVEL_FULL_CTES (whose text stays pinned for
    the r12 proof keys): tvg/vg keep each vector's rprobe nearest
    router cells (rank over the same (gsq, gid) order) and the fine
    argmin ranks over the UNION of those groups' members.
    ``nlist_sub`` is inlined wherever nlist is needed — a literal
    ("16") or a scalar subquery."""
    return f"""vecs AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x + 2.0) * 1000000 + 0.5) AS BIGINT)) AS vm
      FROM embeddings
    ), p AS (
      SELECT greatest(1, CAST(floor(sqrt({nlist_sub})) AS BIGINT)) AS nc
    ), seeds AS (
      SELECT vec_id AS cid, vm AS cm FROM vecs
      WHERE vec_id < {nlist_sub}
    ), tseeds AS (
      SELECT cid AS gid, cm AS gm FROM seeds
      QUALIFY row_number() OVER (ORDER BY cid) <= (SELECT nc FROM p)
    ), tgrp AS (
      SELECT cid, cm, gid FROM (
        SELECT s.cid, s.cm, g.gid, {_dist_sql('s.cm', 'g.gm')} AS gsq
        FROM seeds s CROSS JOIN tseeds g)
      QUALIFY row_number() OVER (PARTITION BY cid ORDER BY gsq, gid) = 1
    ), tvg AS (
      SELECT vec_id, vm, gid FROM (
        SELECT v.vec_id, v.vm, g.gid, {_dist_sql('v.vm', 'g.gm')} AS gsq
        FROM vecs v CROSS JOIN tseeds g)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY gsq, gid)
              <= {rprobe}
    ), a0 AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, s.cid, {_dist_sql('v.vm', 's.cm')} AS sq
        FROM tvg v JOIN tgrp s USING (gid))
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    ), elems AS (
      SELECT a.cid, unnest(range(1, len(v.vm) + 1)) AS pos, unnest(v.vm) AS m
      FROM a0 a JOIN vecs v USING (vec_id)
    ), cmeans AS (
      SELECT cid, pos, CAST(sum(m) AS BIGINT) // count(*) AS nm
      FROM elems GROUP BY cid, pos
    ), cents AS (
      SELECT cid, list(nm ORDER BY pos) AS cm FROM cmeans GROUP BY cid
    ), cseeds AS (
      SELECT cid AS gid, cm AS gm FROM cents
      QUALIFY row_number() OVER (ORDER BY cid) <= (SELECT nc FROM p)
    ), cgrp AS (
      SELECT cid, cm, gid FROM (
        SELECT c.cid, c.cm, g.gid, {_dist_sql('c.cm', 'g.gm')} AS gsq
        FROM cents c CROSS JOIN cseeds g)
      QUALIFY row_number() OVER (PARTITION BY cid ORDER BY gsq, gid) = 1
    ), vg AS (
      SELECT vec_id, vm, gid FROM (
        SELECT v.vec_id, v.vm, g.gid, {_dist_sql('v.vm', 'g.gm')} AS gsq
        FROM vecs v CROSS JOIN cseeds g)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY gsq, gid)
              <= {rprobe}
    ), a2 AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT v.vec_id, c.cid, {_dist_sql('v.vm', 'c.cm')} AS sq
        FROM vg v JOIN cgrp c USING (gid))
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sq, cid) = 1
    )"""


# Fixture-scale proof layout for the multi-probe router: nlist=16 →
# ncoarse=4 router cells, rprobe=3 of 4 — non-vacuous routing (the
# union is a strict subset of the centroid table), unlike the derived
# fixture floor (nlist=8 → ncoarse=2, where rprobe≥2 degenerates to
# the flat argmin).
_RPROBE_NLIST = 16

_SEMDEDUP_RPROBE_SQL = f"""
    WITH {_twolevel_rprobe_ctes(str(_RPROBE_NLIST), TWOLEVEL_RPROBE_PAIR)}, near AS (
      SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
      FROM a2 a
      JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN vecs p ON p.vec_id = a.vec_id
      JOIN vecs q ON q.vec_id = b.vec_id
      WHERE {_dist_sql('p.vm', 'q.vm')} <= {SEMDEDUP_EPS}
      GROUP BY b.vec_id
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           CAST(CASE WHEN n.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
           CAST(COALESCE(n.dup_of, -1) AS BIGINT) AS dup_of
    FROM a2 s LEFT JOIN near n ON n.vec_id = s.vec_id
    """


@register("q_semdedup_rprobe", sql=_SEMDEDUP_RPROBE_SQL)
def q_semdedup_rprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with MULTI-PROBE two-level routing forced on — the
    fixture-scale cross-engine proof of the multi-probe math (routed
    rprobe=TWOLEVEL_RPROBE_PAIR for BOTH argmins, the balance-aware
    routing VERDICT r12 next #2 asked for; since r14 the auto default
    is exact numpy-flat below NUMPY_FLAT_MAX_NLIST, so this routing is
    the production path PAST the measured flat/routed crossover).  nlist is pinned at
    _RPROBE_NLIST=16 so ncoarse=4 > rprobe=3 and the routed union is a
    strict subset of the centroid table (at the derived fixture floor
    nlist=8, ncoarse=2 would make rprobe≥2 degenerate to flat —
    vacuous proof).

    Why multi-probe: the r13 variant search
    (tools/router_balance_probe.py, numpy twin of this exact integer
    pipeline at 64×/nlist=512) measured Σocc² 124.7M at rprobe=1 vs
    46.0M at rprobe=3 vs 36.4M flat — the VERDICT r12 candidate
    mechanisms (spread router seeds 140.4M, capped balanced groups
    122.2M) do nothing, because routing ERROR, not router imbalance,
    concentrates occupancy.  rprobe=3 restores near-flat balance for
    the occupancy² pair stage at 18% of the flat argmin's distance
    work; real 64× stage decomposition in SCALE.md r13.  Spark side:
    the router stage is a pure projection against a broadcast 1-row
    array of router structs (array_sort + slice — shuffle volume
    identical to rprobe=1); full hash oracle through routed training,
    multi-probe routing, assignment and ε-ball verdicts."""
    return semdedup_verdicts(
        spark,
        sf_dir,
        nlist=_RPROBE_NLIST,
        two_level=True,
        train_two_level=True,
        rprobe=TWOLEVEL_RPROBE_PAIR,
    )

"""Batch sinks & auxiliary source formats (SURVEY.md §2.1).

Parquet is the primary sink; CSV/JSON are dev-grade.  The partitioned
writer is the 100 TB-relevant piece: date-partitioned layouts are what
make Catalyst's static + dynamic partition pruning effective on the
read side (SURVEY.md §4 'partition pruning'), and bucketed tables
remove the shuffle from repeated large-scale joins on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned layout (scan-side partition pruning).

    At 100 TB: partition by a low-cardinality time bucket (e.g.
    month(o_orderdate)) — thousands of partitions, not millions; pair
    with maxRecordsPerFile to bound file sizes.

    Rows are clustered by the partition columns BEFORE the write:
    without that repartition every task emits a file into every
    directory it holds rows for — dir-count × cluster-width files
    (measured at 64×/nlist=512: 56,161 files for 128 k rows, readers
    file-open-bound — SCALE.md r13).  One shuffle makes each directory
    one task's output.
    """
    df.repartition(*[F.col(c) for c in partition_cols]).write.mode(
        mode
    ).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: co-located, shuffle-free joins on
    the bucket key for every future query (the pre-shuffle is paid once
    at write time).  Requires saveAsTable (bucket metadata lives in the
    catalog, not the files)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(name)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read.option("header", True)
    return (r.schema(schema) if schema else r.option("inferSchema", True)).csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read
    return (r.schema(schema) if schema else r).json(path)


def compact_parquet(spark: SparkSession, path: str, out_path: str, target_files: int) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (the 100 TB housekeeping op — streaming
    sinks and fine-grained partitions produce file counts that degrade
    scan planning; compaction restores healthy file sizes).  Returns
    the number of files written."""
    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(out_path)
    import glob

    return len(glob.glob(f"{out_path}/part-*.parquet"))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar lake format Spark supports natively;
    same predicate-pushdown / column-pruning story as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_range_clustered(
    df: DataFrame, path: str, cols: list[str], n_files: int, mode: str = "overwrite"
) -> None:
    """Range-clustered layout: rows globally range-partitioned then
    sorted within each file on `cols` — every file owns a disjoint key
    range, so parquet row-group min/max stats skip whole files for
    range/point predicates (the poor man's Z-order, exact for a single
    clustering dimension).  At 100 TB this is the layout for the
    dominant filter column when hive-partitioning is too coarse."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    mode: str = "overwrite",
    bits: int = 8,
) -> None:
    """Z-order (Morton-curve) clustered layout over exactly two
    numeric columns: each column is quantile-bucketed into 2**bits
    ranks, the rank bits are interleaved into a single Z-value, and
    rows are range-partitioned + sorted on it — so every file owns a
    compact *rectangle* in (c1, c2) space and parquet min/max stats
    prune files for selective predicates on EITHER column (the
    Delta/Iceberg OPTIMIZE ZORDER layout, rebuilt from built-ins).

    Scale notes: ranks come from approxQuantile (a distributed
    Greenwald-Khanna sketch — no global sort, no single-partition
    window), the bucket lookup is pyspark.ml Bucketizer (JVM-side),
    and the only shuffle is the final repartitionByRange on the
    Z-value, which any clustering write pays anyway.  Quantile (not
    min/max) scaling keeps the curve balanced under skew."""
    if len(cols) != 2:
        raise ValueError("z-order sink clusters exactly two columns")
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits
    work = df
    rank_cols = []
    for i, c in enumerate(cols):
        probs = [j / n_buckets for j in range(1, n_buckets)]
        cuts = df.approxQuantile(c, probs, 0.001)
        splits = [float("-inf")] + sorted(set(cuts)) + [float("inf")]
        dcol, rcol = f"__zd{i}", f"__zr{i}"
        work = work.withColumn(dcol, F.col(c).cast("double"))
        work = Bucketizer(
            splits=splits, inputCol=dcol, outputCol=rcol, handleInvalid="keep"
        ).transform(work)
        rank_cols.append(rcol)
    r0 = F.col(rank_cols[0]).cast("long")
    r1 = F.col(rank_cols[1]).cast("long")
    z = F.lit(0).cast("long")
    for k in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(r0, k).bitwiseAND(F.lit(1)), 2 * k)
            + F.shiftleft(F.shiftright(r1, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
    (
        work.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *rank_cols, *[f"__zd{i}" for i in range(2)])
        .write.mode(mode)
        .parquet(path)
    )

"""Multimodal column handling (SURVEY.md §2.10).

The fixtures carry no real image/audio bytes, so the *payload* here is
synthesized deterministically (the doc text's bytes stand in for a
media blob), but the Spark-side plumbing is the real thing a 100 TB
multimodal pipeline needs:

- media as an opaque ``BinaryType`` column inside a typed struct
  (payload + metadata), so Parquet stores it as a byte array column
  that column-pruning can skip entirely when a query only touches
  metadata;
- decode / feature-extraction as an Arrow-batched ``mapInPandas``
  stage with an explicit output schema — the decode itself is STUBBED
  (this container has no image/audio codecs) behind
  ``decode_stub_features``, which computes deterministic fake features
  (byte-length, first-byte, simple byte checksum) so the pipeline
  shape, schema, batching, and partitioning are all executed and
  testable;
- a pure-SQL twin (q_multimodal) over the struct/binary columns so the
  oracle can verify the relational plumbing (nested field projection,
  binary length/hash) even though real decoding is out of scope.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from processor_spark.registry import register
from processor_spark.sources import load


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents recast as a multimodal table: struct(payload binary, meta)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.struct(
            F.encode("text", "utf-8").alias("payload"),
            F.struct(
                F.lit("text/plain").alias("mime"),
                F.col("n_chars").alias("n_bytes_claimed"),
                F.col("source").alias("origin"),
            ).alias("meta"),
        ).alias("media"),
    )


@register(
    "q_multimodal",
    sql="""
    SELECT doc_id,
           'text/plain' AS mime,
           octet_length(encode(text)) AS payload_bytes,
           md5(text) AS payload_md5,
           source AS origin
    FROM documents
    WHERE octet_length(encode(text)) > 100
    """,
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational plumbing over a multimodal struct: nested projection,
    binary length + digest, metadata filter — no decode involved, so
    fully oracle-checkable.
    """
    m = media_table(spark, sf_dir)
    return (
        m.select(
            "doc_id",
            F.col("media.meta.mime").alias("mime"),
            F.length(F.col("media.payload")).alias("payload_bytes"),
            F.md5(F.col("media.payload")).alias("payload_md5"),
            F.col("media.meta.origin").alias("origin"),
        )
        .where(F.col("payload_bytes") > 100)
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def decode_stub_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: real image/audio decode would go here (PIL/ffmpeg are
    not in this container).  Emits deterministic fake features so the
    mapInPandas plumbing (schema, Arrow batching, per-partition
    execution) is fully exercised.  ``decoded`` is False to make the
    stub-ness explicit in the output contract.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "byte_checksum": payloads.map(lambda b: sum(b) % 1_000_000_007).astype("int64"),
                "decoded": False,
            }
        )


@register(
    "q_media_features",
    sql="""
    WITH payloads AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    )
    SELECT doc_id,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           CASE WHEN octet_length(payload) = 0 THEN -1
                ELSE CAST(('0x' || substr(hex(payload), 1, 2)) AS INTEGER) END
             AS first_byte,
           CAST(list_sum(list_transform(range(1, octet_length(payload) + 1),
                i -> CAST(('0x' || substr(hex(payload), 2 * CAST(i AS INTEGER) - 1, 2))
                          AS INTEGER))) % 1000000007 AS BIGINT) AS byte_checksum,
           FALSE AS decoded
    FROM payloads
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched mapInPandas.

    The one sanctioned Python-boundary crossing in the engine (SURVEY.md
    §2.11 policy): batch-wise Arrow transfer, explicit output schema,
    stub decode.  Repartitioned by doc_id so batches are balanced
    regardless of upstream file layout.

    Carries a FULL SQL oracle: DuckDB re-derives every feature from the
    payload BLOB itself (hex-pair byte walk for the checksum), so the
    binary column's round-trip through Arrow into pandas bytes — the
    exact plumbing a real image decoder would sit on — is
    value-hash-verified, not just row-counted.
    """
    m = media_table(spark, sf_dir)
    flat = m.repartition(8, "doc_id").select(
        "doc_id", F.col("media.payload").alias("payload")
    )
    return flat.mapInPandas(decode_stub_features, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def resize_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize: a real implementation decodes the image and emits a
    WxH thumbnail (PIL not in this container).  The fake derives a
    deterministic "resolution" from payload length and returns the
    payload head as the thumb bytes — schema and batching are real.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (n % 640 + 16).astype("int32"),
                "height": (n % 480 + 16).astype("int32"),
                "thumb": payloads.map(lambda b: bytes(b[:16])),
                "decoded": False,
            }
        )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler: a real implementation pulls every k-th video
    frame (ffmpeg not in this container).  The fake slices the payload
    into 4 deterministic "frames" — exercising the 1→N row expansion a
    frame sampler needs (mapInPandas may emit more rows than it reads).
    """
    for pdf in batches:
        rows = {"doc_id": [], "frame_no": [], "frame_bytes": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            step = max(1, len(payload) // 4)
            for i in range(4):
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(i)
                rows["frame_bytes"].append(bytes(payload[i * step : i * step + 8]))
        yield pd.DataFrame(rows)


@register("q_media_resize", sql=None)  # pandas-UDF path → rows-only
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode+resize stage over binary payloads (mapInPandas)."""
    m = media_table(spark, sf_dir)
    flat = m.repartition(8, "doc_id").select("doc_id", F.col("media.payload").alias("payload"))
    return flat.mapInPandas(resize_stub, RESIZE_SCHEMA)


@register("q_media_frames", sql=None)  # pandas-UDF path → rows-only
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed frame sampling (1→4 row expansion) + per-doc frame count."""
    m = media_table(spark, sf_dir)
    flat = m.repartition(8, "doc_id").select("doc_id", F.col("media.payload").alias("payload"))
    frames = flat.mapInPandas(frame_sample_stub, FRAME_SCHEMA)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame_bytes")).alias("total_frame_bytes"),
    )

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


@register("q_media_features", sql=None)  # pandas-UDF path → rows-only check
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched mapInPandas.

    The one sanctioned Python-boundary crossing in the engine (SURVEY.md
    §2.11 policy): batch-wise Arrow transfer, explicit output schema,
    stub decode.  Repartitioned by doc_id so batches are balanced
    regardless of upstream file layout.
    """
    m = media_table(spark, sf_dir)
    flat = m.repartition(8, "doc_id").select(
        "doc_id", F.col("media.payload").alias("payload")
    )
    return flat.mapInPandas(decode_stub_features, FEATURE_SCHEMA)

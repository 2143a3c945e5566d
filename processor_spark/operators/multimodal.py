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
  stage with an explicit output schema.  The format-codec tier is REAL
  where a fixed-layout format allows it without codec libraries:
  q_media_decode / q_media_resize generate genuine 24-bit BMP payloads
  and decode them with pure ``struct`` byte-walking (header parse, BGR
  channels, 4-byte row stride), value-verified by a DuckDB oracle that
  replays the generator's closed-form pixel formula.  Only the
  compressed-codec paths (video frame extraction) remain honest stubs
  (``frame_sample_stub``) — no ffmpeg/PIL in this container — with the
  Arrow plumbing executed and tested;
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


# ---------------------------------------------------------------------------
# Real image decode (r4): the container has no codec libraries, but BMP
# is a fixed-layout format decodable with pure ``struct`` byte-walking —
# so the decode tier is REAL here, not a stub.  Payload generation is
# deterministic from (doc_id, n_chars): W×H 24-bit BMPs, all channels
# v(x, y) = (doc_id + 11x + 23y) % 256, rows stride-padded to 4 bytes.
# The DuckDB oracle re-derives every decoded stat from that closed-form
# formula WITHOUT seeing the bytes — a decoder that misparses the
# header, the BGR layout, or the row padding diverges immediately.
# ---------------------------------------------------------------------------


def _encode_bmp(doc_id: int, n_chars: int) -> bytes:
    import struct

    w = 4 + doc_id % 5
    h = 4 + n_chars % 7
    stride = (w * 3 + 3) // 4 * 4
    img_size = stride * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(h):
        for x in range(w):
            v = (doc_id + 11 * x + 23 * y) % 256
            rows += bytes((v, v, v))
        rows += b"\x00" * (stride - w * 3)
    return bytes(header + info + rows)


def bmp_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic real-BMP payload column (binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _encode_bmp(int(d), int(n))
                        for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    d = load(spark, sf_dir, "documents", spread=True).select("doc_id", "n_chars")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return d.mapInPandas(gen, schema)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_milli", T.LongType()),
        T.StructField("wsum", T.LongType()),
    ]
)


def decode_bmp_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL BMP decode: parse the file+info headers with ``struct``,
    walk the stride-padded pixel rows, and emit per-image stats.  No
    knowledge of the generator's formula is used — width/height/data
    offset come from the header bytes."""
    import struct

    for pdf in batches:
        out = {k.name: [] for k in DECODE_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:2] != b"BM":
                raise ValueError(f"doc {doc_id}: not a BMP payload")
            data_off = struct.unpack_from("<I", b, 10)[0]
            w = struct.unpack_from("<i", b, 18)[0]
            h = struct.unpack_from("<i", b, 22)[0]
            bpp = struct.unpack_from("<H", b, 28)[0]
            if bpp != 24:
                raise ValueError(f"doc {doc_id}: expected 24bpp, got {bpp}")
            stride = (w * 3 + 3) // 4 * 4
            sum_v = 0
            wsum = 0
            i = 0
            for y in range(h):
                base = data_off + y * stride
                for x in range(w):
                    v = b[base + 3 * x]  # blue channel (channels equal)
                    sum_v += v
                    i += 1
                    wsum += i * v
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["n_pixels"].append(w * h)
            out["mean_milli"].append((1000 * sum_v) // (w * h))
            out["wsum"].append(wsum)
        yield pd.DataFrame(out)


@register(
    "q_media_decode",
    sql="""
    WITH dims AS (
      SELECT doc_id, n_chars,
             4 + doc_id % 5 AS w,
             4 + n_chars % 7 AS h
      FROM documents
    ), px AS (
      SELECT doc_id, w, h,
             list_sum(list_transform(range(0, w * h),
               i -> (doc_id + 11 * (i % w) + 23 * (i // w)) % 256)) AS sum_v,
             list_sum(list_transform(range(0, w * h),
               i -> (i + 1) * ((doc_id + 11 * (i % w) + 23 * (i // w)) % 256))) AS ws
      FROM dims
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST((1000 * sum_v) // (w * h) AS BIGINT) AS mean_milli,
           CAST(ws AS BIGINT) AS wsum
    FROM px
    """,
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real BMP payloads (pure-struct byte walk over Arrow
    batches) and emit per-image stats — the value-verified decode tier:
    the oracle recomputes width/height/mean/weighted-checksum from the
    generator's closed-form pixel formula, so header parsing, BGR
    layout, and 4-byte row padding are all hash-checked."""
    return bmp_table(spark, sf_dir).mapInPandas(decode_bmp_stats, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb_wsum", T.LongType()),
    ]
)


def resize_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL resize: decode the BMP (header + stride walk) and 2×
    nearest-neighbor downsample — thumbnail pixel (x, y) samples source
    pixel (2x, 2y).  Emits the thumb dimensions and an order-weighted
    checksum of the sampled pixels so the oracle can verify the exact
    sampling grid."""
    import struct

    for pdf in batches:
        out = {"doc_id": [], "thumb_w": [], "thumb_h": [], "thumb_wsum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:2] != b"BM":
                raise ValueError(f"doc {doc_id}: not a BMP payload")
            data_off = struct.unpack_from("<I", b, 10)[0]
            w = struct.unpack_from("<i", b, 18)[0]
            h = struct.unpack_from("<i", b, 22)[0]
            stride = (w * 3 + 3) // 4 * 4
            tw, th = (w + 1) // 2, (h + 1) // 2
            wsum = 0
            j = 0
            for y in range(th):
                base = data_off + (2 * y) * stride
                for x in range(tw):
                    j += 1
                    wsum += j * b[base + 3 * (2 * x)]
            out["doc_id"].append(doc_id)
            out["thumb_w"].append(tw)
            out["thumb_h"].append(th)
            out["thumb_wsum"].append(wsum)
        yield pd.DataFrame(out)


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


@register(
    "q_media_resize",
    sql="""
    WITH dims AS (
      SELECT doc_id,
             4 + doc_id % 5 AS w,
             4 + n_chars % 7 AS h
      FROM documents
    ), t AS (
      SELECT doc_id, w, h,
             (w + 1) // 2 AS tw,
             (h + 1) // 2 AS th
      FROM dims
    )
    SELECT doc_id,
           CAST(tw AS INTEGER) AS thumb_w,
           CAST(th AS INTEGER) AS thumb_h,
           CAST(list_sum(list_transform(range(0, tw * th),
             j -> (j + 1) * ((doc_id + 11 * (2 * (j % tw)) + 23 * (2 * (j // tw))) % 256)))
             AS BIGINT) AS thumb_wsum
    FROM t
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real decode + 2× nearest-neighbor resize over BMP payloads
    (mapInPandas, pure-struct).  SQL-oracled: DuckDB replays the exact
    sampling grid (source pixel (2x, 2y)) from the generator formula,
    so a resize that samples the wrong pixels or mis-walks the stride
    fails the value hash."""
    return bmp_table(spark, sf_dir).mapInPandas(resize_bmp, RESIZE_SCHEMA)


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

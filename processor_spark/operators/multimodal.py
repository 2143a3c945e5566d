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
  replays the generator's closed-form pixel formula; q_media_frames
  samples frames from an uncompressed video container by offset seek,
  and q_media_audio chunk-walks genuine RIFF/WAVE PCM — all three
  decode tiers are real (no codec library needed for fixed-layout
  formats) and SQL-oracled.  Only compressed-codec decode (JPEG/H.264)
  is out of scope — no ffmpeg/PIL in this container;
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
    import numpy as np

    stride = (w * 3 + 3) // 4 * 4
    img_size = stride * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    px = (
        (
            doc_id
            + 23 * np.arange(h, dtype=np.int64)[:, None]
            + 11 * np.arange(w, dtype=np.int64)[None, :]
        )
        % 256
    ).astype(np.uint8)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = np.repeat(px, 3, axis=1)
    return header + info + rows.tobytes()


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

    import numpy as np

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
            rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
            # blue channel of each pixel (channels equal), row-major
            px = rows.reshape(h, stride)[:, : w * 3 : 3].astype(np.int64).ravel()
            sum_v = int(px.sum())
            wsum = int(np.arange(1, w * h + 1, dtype=np.int64) @ px)
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

    import numpy as np

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
            rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
            # nearest-neighbor grid: source pixel (2x, 2y), blue channel
            thumb = (
                rows.reshape(h, stride)[::2, : w * 3 : 6].astype(np.int64).ravel()
            )
            wsum = int(np.arange(1, tw * th + 1, dtype=np.int64) @ thumb)
            out["doc_id"].append(doc_id)
            out["thumb_w"].append(tw)
            out["thumb_h"].append(th)
            out["thumb_wsum"].append(wsum)
        yield pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Video tier — an uncompressed fixed-layout container ("SVF1": magic +
# <HHH n_frames/width/height> + raw n_frames×(w·h) luma planes), so
# frame EXTRACTION — the part of a video pipeline that is container
# parsing, not codec work — is real and value-verified without ffmpeg.
# Payloads are deterministic from (doc_id, n_chars); the DuckDB oracle
# replays the closed-form pixel formula for every SAMPLED frame, so a
# sampler that miscounts frames, walks the wrong frame offsets, or
# samples the wrong stride diverges immediately.
# ---------------------------------------------------------------------------


def _encode_svf(doc_id: int, n_chars: int) -> bytes:
    import struct

    import numpy as np

    n_frames = 3 + doc_id % 6
    w = 4 + n_chars % 5
    h = 3 + doc_id % 4
    frames = (
        (
            doc_id
            + 7 * np.arange(n_frames, dtype=np.int64)[:, None]
            + 13 * np.arange(w * h, dtype=np.int64)[None, :]
        )
        % 256
    ).astype(np.uint8)
    return b"SVF1" + struct.pack("<HHH", n_frames, w, h) + frames.tobytes()


def svf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic raw-video payload column (binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _encode_svf(int(d), int(n))
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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("frame_wsum", T.LongType()),
    ]
)


def sample_svf_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL frame sampling: parse the SVF header with ``struct``, seek
    every 2nd frame by computed offset (never touching the skipped
    frames — the point of frame sampling at 100 TB is to NOT read most
    of the video), and emit per-sampled-frame stats.  The 1→N row
    expansion is genuine: one input row yields one output row per
    sampled frame."""
    import struct

    import numpy as np

    for pdf in batches:
        out = {"doc_id": [], "frame_no": [], "px_sum": [], "frame_wsum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:4] != b"SVF1":
                raise ValueError(f"doc {doc_id}: not an SVF payload")
            n_frames, w, h = struct.unpack_from("<HHH", b, 4)
            fsz = w * h
            weights = np.arange(1, fsz + 1, dtype=np.int64)
            for f in range(0, n_frames, 2):
                off = 10 + f * fsz
                px = np.frombuffer(b, dtype=np.uint8, count=fsz, offset=off).astype(
                    np.int64
                )
                out["doc_id"].append(doc_id)
                out["frame_no"].append(f)
                out["px_sum"].append(int(px.sum()))
                out["frame_wsum"].append(int(weights @ px))
        yield pd.DataFrame(out)


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


@register(
    "q_media_frames",
    sql="""
    WITH dims AS (
      SELECT doc_id,
             3 + doc_id % 6 AS nf,
             4 + n_chars % 5 AS w,
             3 + doc_id % 4 AS h
      FROM documents
    ), fr AS (
      SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS f
      FROM dims
    )
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_no,
           CAST(list_sum(list_transform(range(0, w * h),
             i -> (doc_id + 7 * f + 13 * i) % 256)) AS BIGINT) AS px_sum,
           CAST(list_sum(list_transform(range(0, w * h),
             i -> (i + 1) * ((doc_id + 7 * f + 13 * i) % 256))) AS BIGINT) AS frame_wsum
    FROM fr
    """,
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video-frame sampling over an uncompressed fixed-layout
    container: parse the SVF header, seek every 2nd frame by offset
    (skipped frames are never read), emit per-frame luma stats — the
    1→N mapInPandas row expansion, value-verified: the DuckDB oracle
    replays the closed-form pixel formula for exactly the sampled
    frame numbers, so frame addressing, sampling stride, and plane
    walking are all hash-checked."""
    return svf_table(spark, sf_dir).mapInPandas(sample_svf_frames, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio tier — real RIFF/WAVE PCM: payloads are genuine WAV files
# (RIFF header, fmt chunk, data chunk of little-endian int16 samples)
# generated deterministically from doc_id; the decoder does a REAL
# chunk walk (reads chunk ids + sizes, skips unknown chunks) and
# vectorized sample decode via numpy.frombuffer — no audio library.
# The DuckDB oracle replays the closed-form sample formula, so header
# layout, chunk framing, and int16 endianness are all value-verified.
# ---------------------------------------------------------------------------

_WAV_RATE = 8000


def _encode_wav(doc_id: int) -> bytes:
    import struct

    import numpy as np

    n = 64 + (doc_id * 7) % 97
    samples = (
        ((doc_id * 31 + 17 * np.arange(n, dtype=np.int64)) % 4001 - 2000)
        .astype("<i2")
        .tobytes()
    )
    fmt = struct.pack("<HHIIHH", 1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16)
    # a JUNK chunk before data forces decoders to walk chunks, not
    # assume the fixed 44-byte layout
    junk = b"JUNK" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + junk
    body += b"data" + struct.pack("<I", len(samples)) + samples
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic real-WAV payload column (binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_encode_wav(int(d)) for d in pdf["doc_id"]],
                }
            )

    d = load(spark, sf_dir, "documents", spread=True).select("doc_id")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return d.mapInPandas(gen, schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_abs_milli", T.LongType()),
        T.StructField("wav_wsum", T.LongType()),
    ]
)


def decode_wav_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL WAV decode: walk RIFF chunks (fmt/data by id, skipping
    unknown chunks with odd-size padding per the RIFF spec), then
    vectorized int16 decode.  No knowledge of the generator formula."""
    import struct

    import numpy as np

    for pdf in batches:
        out = {k.name: [] for k in AUDIO_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError(f"doc {doc_id}: not a RIFF/WAVE payload")
            pos, rate, bits, channels, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid, csz = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
                body = b[pos + 8 : pos + 8 + csz]
                if cid == b"fmt ":
                    _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
                elif cid == b"data":
                    data = body
                pos += 8 + csz + (csz & 1)  # RIFF chunks are word-aligned
            if rate is None or data is None or bits != 16 or channels != 1:
                raise ValueError(f"doc {doc_id}: unsupported WAV layout")
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            n = len(s)
            w = np.arange(1, n + 1, dtype=np.int64)
            out["doc_id"].append(doc_id)
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            out["mean_abs_milli"].append(int(1000 * np.abs(s).sum()) // n)
            out["wav_wsum"].append(int(w @ s))
        yield pd.DataFrame(out)


@register(
    "q_media_audio",
    sql="""
    WITH dims AS (
      SELECT doc_id, 64 + (doc_id * 7) % 97 AS n FROM documents
    ), st AS (
      SELECT doc_id, n,
             list_sum(list_transform(range(0, n),
               t -> abs(((doc_id * 31 + t * 17) % 4001) - 2000))) AS sum_abs,
             list_sum(list_transform(range(0, n),
               t -> (t + 1) * (((doc_id * 31 + t * 17) % 4001) - 2000))) AS ws
      FROM dims
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST((1000 * sum_abs) // n AS BIGINT) AS mean_abs_milli,
           CAST(ws AS BIGINT) AS wav_wsum
    FROM st
    """,
)
def q_media_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode tier: genuine RIFF/WAVE PCM payloads parsed by
    a spec-correct chunk walk (skips a planted JUNK chunk, honors RIFF
    word alignment) with vectorized int16 sample decode; per-clip
    amplitude stats in exact integer milli-units.  SQL-oracled: DuckDB
    replays the closed-form sample stream, so chunk framing, endianness
    and the amplitude math are hash-checked."""
    return wav_table(spark, sf_dir).mapInPandas(decode_wav_stats, AUDIO_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash48", T.LongType()),
    ]
)


def dhash_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL perceptual difference-hash over decoded BMP pixels: one bit
    per horizontally adjacent pixel pair (right > left), row-major,
    truncated to the portable 48-bit width.  Pure header-driven byte
    walk — no generator knowledge."""
    import struct

    import numpy as np

    for pdf in batches:
        ids: list[int] = []
        hs: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:2] != b"BM":
                raise ValueError(f"doc {doc_id}: not a BMP payload")
            data_off = struct.unpack_from("<I", b, 10)[0]
            w = struct.unpack_from("<i", b, 18)[0]
            h = struct.unpack_from("<i", b, 22)[0]
            stride = (w * 3 + 3) // 4 * 4
            rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
            px = rows.reshape(h, stride)[:, : w * 3 : 3].astype(np.int64)
            bits = (px[:, 1:] > px[:, :-1]).ravel()[:48].astype(np.int64)
            ids.append(int(doc_id))
            hs.append(int((bits << np.arange(bits.size, dtype=np.int64)).sum()))
        yield pd.DataFrame({"doc_id": ids, "dhash48": hs})


@register(
    "q_media_phash",
    sql="""
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 4 + n_chars % 7 AS h
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(0, least((w - 1) * h, 48)),
               k -> CASE WHEN (doc_id + 23 * (k // (w - 1)) + 11 * ((k % (w - 1)) + 1)) % 256
                            > (doc_id + 23 * (k // (w - 1)) + 11 * (k % (w - 1))) % 256
                    THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END))
               AS BIGINT) AS dhash48
      FROM dims
    )
    SELECT dhash48, min(doc_id) AS keeper_doc_id, count(*) AS n_images
    FROM hashed GROUP BY dhash48
    """,
)
def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal rung of the dedup
    ladder: every BMP payload is REALLY decoded (header byte-walk) and
    difference-hashed (one bit per horizontal neighbor comparison —
    brightness-shift invariant, the property that makes dHash find
    re-encoded/re-exposed copies byte-identical hashing misses), then
    images dedup by hash exactly like q_dedup_exact dedups text.  The
    synthetic corpus genuinely contains such near-dups (images whose
    pixels differ by a constant offset collide unless the offset wraps
    mod 256), so n_images > 1 groups are real, and the oracle replays
    hash AND grouping from the generator's closed-form pixel formula —
    a decoder or bit-packing bug hash-fails.

    Scale shape: decode+hash is one Arrow-batched mapInPandas
    projection (embarrassingly parallel, no shuffle); the dedup agg is
    a single map-side-combinable hash-agg on the 48-bit key.  At 100 TB
    the Hamming-radius>0 variant buckets by hash BANDS (same LSH
    algebra as q_dedup_minhash_md5) — exact-collision grouping is the
    radius-0 case and needs no pair join at all."""
    ph = bmp_table(spark, sf_dir).mapInPandas(dhash_bmp, PHASH_SCHEMA)
    return ph.groupBy("dhash48").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_images"),
    )


# ---------------------------------------------------- phash near-dups

_PHASH_RADIUS = 3  # max Hamming distance for a near-duplicate pair
_PHASH_BANDS = 4  # 4 bands x 12 bits over the 48-bit dhash


def _phash_near_sql() -> str:
    """Naive theta-join twin over the composed q_media_phash oracle:
    exact Hamming <= radius on every distinct-hash pair.  The engine
    uses band-bucket LSH; equality with this exhaustive twin PROVES
    the 4x12-bit band cover complete for radius 3 (pigeonhole: <= 3
    differing bits cannot touch all 4 bands) — the q_join_spatial
    proof pattern."""
    from processor_spark import registry as _registry_mod

    mp = _registry_mod._REGISTRY["q_media_phash"].sql
    return f"""
    WITH reps AS (
      SELECT dhash48 AS h, keeper_doc_id AS rep FROM ({mp}) mp
    )
    SELECT a.rep AS doc_a, b.rep AS doc_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM reps a JOIN reps b ON a.h < b.h
    WHERE bit_count(xor(a.h, b.h)) <= {_PHASH_RADIUS}
    ORDER BY doc_a, doc_b
    """


@register("q_phash_near", sql=_phash_near_sql())
def q_phash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-duplicate image pairs (Hamming <= 3 on the
    48-bit dHash) — the radius>0 rung q_media_phash's docstring
    promises: re-encoded/re-exposed copies whose difference hashes
    drift by a few bits, found without an all-pairs join.

    Band-bucket LSH for Hamming space: exact-duplicate mass first
    collapses via the distinct-hash agg (the classic hotspot is gone
    before banding), then each distinct hash posts to 4 buckets keyed
    by its 12-bit bands.  Any pair within radius 3 shares >= 1 intact
    band (pigeonhole over 4 bands), so bucket-local pairs + an exact
    bit_count(XOR) filter find exactly the true pairs — proven by the
    exhaustive theta-join oracle.  Pairs are generated locally from
    per-bucket sorted posting arrays (the dedup.py pattern — no
    self-join), deduped across bands, then Hamming-filtered.

    Scale shape: decode+hash is embarrassingly parallel mapInPandas;
    the distinct agg is map-side combinable; bucket size is bounded by
    the near-dup mass per 12-bit band key of DISTINCT hashes (exact
    dupes already collapsed), so no all-pairs stage exists at any
    corpus size."""
    ph = bmp_table(spark, sf_dir).mapInPandas(dhash_bmp, PHASH_SCHEMA)
    reps = ph.groupBy("dhash48").agg(F.min("doc_id").alias("rep"))
    band_keys = F.array(
        *[F.expr(f"(dhash48 >> {12 * b}) & 4095") for b in range(_PHASH_BANDS)]
    )
    bands = reps.select(
        "dhash48", "rep", F.posexplode(band_keys).alias("band_id", "band_key")
    )
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("dhash48", "rep"))).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    pair_expr = (
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x.dhash48 AS h_a, y.dhash48 AS h_b, "
        "x.rep AS doc_a, y.rep AS doc_b))))"
    )
    cands = (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.h_a", "p.h_b", "p.doc_a", "p.doc_b")
        .distinct()
    )
    return (
        cands.select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(h_a ^ h_b) AS BIGINT)").alias("hamming"),
        )
        .where(F.col("hamming") <= _PHASH_RADIUS)
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------- phash clusters


def _phash_clusters_sql() -> str:
    """Composes the q_phash_near oracle as the edge list, then the
    recursive-reachability min-label CC twin (the q_dedup_clusters
    oracle pattern)."""
    from processor_spark import registry as _registry_mod

    near = _registry_mod._REGISTRY["q_phash_near"].sql
    return f"""
    WITH RECURSIVE near AS (
      SELECT doc_a, doc_b FROM ({near}) pn
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM near
      UNION
      SELECT doc_b, doc_a FROM near
    ), reach(src, dst) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    ORDER BY doc_id
    """


@register("q_phash_clusters", sql=_phash_clusters_sql())
def q_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image FAMILIES: connected components
    over the Hamming<=3 dHash pair graph (q_phash_near), labeling each
    involved image with its family's minimum doc_id — the keep-one-
    per-family decision a multimodal dedup pass executes (pairwise
    output alone can't pick survivors when A~B~C but A!~C).

    Spark side runs the O(log n) large-star/small-star CC
    (graph.connected_components — per-round localCheckpoint); the
    oracle replays reachability as a recursive CTE.  Labels are
    algorithm-independent (min node per component), so the two agree
    exactly.

    Scale shape: the pair graph is band-bucket-bounded (q_phash_near);
    CC rounds shuffle the edge list keyed by node — the standard
    alternating-star plan, logarithmic rounds."""
    from processor_spark.operators.graph import connected_components

    pairs = (
        q_phash_near(spark, sf_dir)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    return connected_components(pairs).orderBy("doc_id")


# ------------------------------------------------------- scene cuts

_CUT_FACTOR = 16  # cut when pair SAD > 16 * (w*h), i.e. mean |diff| > 16

SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_sad", T.LongType()),
        T.StructField("max_sad", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
    ]
)


def scene_stats_svf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL scene-cut detection over the SVF container: parse the
    header, reshape the raw luma planes, and compute per-consecutive-
    frame SAD (sum of absolute pixel differences) with one vectorized
    np.diff — the shot-segmentation primitive a video pipeline runs
    before captioning/sampling.  Frame pairs whose SAD exceeds
    _CUT_FACTOR * frame_area are cuts."""
    import struct

    import numpy as np

    for pdf in batches:
        out = {"doc_id": [], "n_frames": [], "total_sad": [], "max_sad": [], "n_cuts": []}
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(b)
            if b[:4] != b"SVF1":
                raise ValueError(f"doc {doc_id}: not an SVF payload")
            n_frames, w, h = struct.unpack_from("<HHH", b, 4)
            area = w * h
            planes = np.frombuffer(b, dtype=np.uint8, offset=10).astype(np.int64)
            frames = planes.reshape(n_frames, area)
            sads = np.abs(np.diff(frames, axis=0)).sum(axis=1)
            out["doc_id"].append(int(doc_id))
            out["n_frames"].append(int(n_frames))
            out["total_sad"].append(int(sads.sum()) if len(sads) else 0)
            out["max_sad"].append(int(sads.max()) if len(sads) else 0)
            out["n_cuts"].append(int((sads > _CUT_FACTOR * area).sum()))
        yield pd.DataFrame(out)


@register(
    "q_media_scenecut",
    sql=f"""
    WITH dims AS (
      SELECT doc_id,
             3 + doc_id % 6 AS nf,
             (4 + n_chars % 5) * (3 + doc_id % 4) AS area
      FROM documents
    ), sads AS (
      SELECT doc_id, nf, area,
             list_transform(range(0, nf - 1), f ->
               list_sum(list_transform(range(0, area), k ->
                 abs(((doc_id + 7 * (f + 1) + 13 * k) % 256)
                     - ((doc_id + 7 * f + 13 * k) % 256))))) AS s
      FROM dims
    )
    SELECT doc_id,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(coalesce(list_sum(s), 0) AS BIGINT) AS total_sad,
           CAST(coalesce(list_max(s), 0) AS BIGINT) AS max_sad,
           CAST(len(list_filter(s, x -> x > {_CUT_FACTOR} * area)) AS BIGINT) AS n_cuts
    FROM sads
    ORDER BY doc_id
    """,
)
def q_media_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the raw-video tier: per video, the
    consecutive-frame SAD profile (total, max) and the number of
    boundaries above the cut threshold — real container parsing +
    vectorized frame differencing in Arrow-batched mapInPandas,
    value-verified end to end by the closed-form pixel-formula replay
    (a decoder that walks wrong offsets or mis-shapes planes diverges
    on every row).

    Scale shape: embarrassingly parallel narrow map (each video's
    frames never leave the task that decoded them); the output is one
    row per video."""
    return (
        svf_table(spark, sf_dir)
        .mapInPandas(scene_stats_svf, SCENE_SCHEMA)
        .orderBy("doc_id")
    )


# ------------------------------- audio activity segmentation (r11)

AUDIO_SEG_WIN = 16          # samples per analysis window
AUDIO_SEG_THRESH = 16_000   # window abs-sum >= this → "active"

AUDIO_WIN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("w", T.LongType()),
        T.StructField("s", T.LongType()),
    ]
)


def decode_wav_windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL WAV decode (same spec-correct RIFF chunk walk as
    decode_wav_stats) emitting one row per FULL analysis window:
    (doc_id, window index, window abs-amplitude sum).  The sample
    tail shorter than a window is dropped on both engines."""
    import struct

    import numpy as np

    for pdf in batches:
        out = {"doc_id": [], "w": [], "s": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError(f"doc {doc_id}: not a RIFF/WAVE payload")
            pos, bits, channels, data = 12, None, None, None
            while pos + 8 <= len(b):
                cid, csz = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
                body = b[pos + 8 : pos + 8 + csz]
                if cid == b"fmt ":
                    _, channels, _, _, _, bits = struct.unpack_from("<HHIIHH", body)
                elif cid == b"data":
                    data = body
                pos += 8 + csz + (csz & 1)
            if data is None or bits != 16 or channels != 1:
                raise ValueError(f"doc {doc_id}: unsupported WAV layout")
            s = np.abs(np.frombuffer(data, dtype="<i2").astype(np.int64))
            nw = len(s) // AUDIO_SEG_WIN
            if nw == 0:
                continue
            sums = s[: nw * AUDIO_SEG_WIN].reshape(nw, AUDIO_SEG_WIN).sum(axis=1)
            out["doc_id"].extend([int(doc_id)] * nw)
            out["w"].extend(range(nw))
            out["s"].extend(int(x) for x in sums)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "w": pd.Series(out["w"], dtype="int64"),
                "s": pd.Series(out["s"], dtype="int64"),
            }
        )


@register(
    "q_audio_segments",
    sql=f"""
    WITH dims AS (
      SELECT doc_id, 64 + (doc_id * 7) % 97 AS n FROM documents
    ), wins AS (
      SELECT doc_id, unnest(range(0, n // {AUDIO_SEG_WIN})) AS w FROM dims
    ), wsum AS (
      SELECT doc_id, w,
             list_sum(list_transform(
               range({AUDIO_SEG_WIN} * w, {AUDIO_SEG_WIN} * w + {AUDIO_SEG_WIN}),
               t -> abs(((doc_id * 31 + t * 17) % 4001) - 2000))) AS s
      FROM wins
    ), act AS (
      SELECT doc_id, w, s FROM wsum WHERE s >= {AUDIO_SEG_THRESH}
    ), isl AS (
      SELECT doc_id, w, s,
             w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
      FROM act
    )
    SELECT doc_id,
           CAST(min(w) AS BIGINT) AS start_win,
           CAST(max(w) AS BIGINT) AS end_win,
           CAST(count(*) AS BIGINT) AS n_wins,
           CAST(sum(s) AS BIGINT) AS seg_sum_abs
    FROM isl GROUP BY doc_id, grp
    """,
)
def q_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation (the VAD-shaped pass a speech
    pipeline runs before transcription): REAL RIFF/WAVE byte decode →
    per-window integer abs-amplitude sums (numpy reshape, the
    mapInPandas codec rule) → active windows (sum ≥ threshold) →
    maximal contiguous runs via relational gaps-islands — one segment
    row per run with exact integer mass.  The oracle replays the
    closed-form sample stream (the q_media_audio contract), so chunk
    framing, windowing, threshold and the island closure are all
    hash-checked.  Scale: decode is a linear narrow map; the island
    window partitions by doc_id — no cross-document state."""
    from pyspark.sql import Window

    wins = wav_table(spark, sf_dir).mapInPandas(decode_wav_windows, AUDIO_WIN_SCHEMA)
    act = wins.where(F.col("s") >= AUDIO_SEG_THRESH)
    grp = (F.col("w") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("w")
    )).alias("grp")
    return (
        act.select("doc_id", "w", "s", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("w").alias("start_win"),
            F.max("w").alias("end_win"),
            F.count(F.lit(1)).alias("n_wins"),
            F.sum("s").alias("seg_sum_abs"),
        )
        .select(
            "doc_id",
            F.col("start_win").cast("long"),
            F.col("end_win").cast("long"),
            F.col("n_wins").cast("long"),
            F.col("seg_sum_abs").cast("long"),
        )
    )

"""Multimodal column plumbing (north-star extension): image/audio/video as
opaque ``binary`` columns with typed metadata structs.

The container has no image/audio libraries, so the actual decode is STUBBED
(``decode_image_real`` raises NotImplementedError; ``decode_image_fake`` is
a deterministic stand-in) — but everything Spark-side is real and tested:
schema, Arrow batch shape, ``mapInPandas`` plumbing, partition behavior, and
the pattern for memory-bounding large blobs (repartition by size budget
before the decode stage so one task never holds more than
``target_batch_bytes`` of media).

Production swap-in: replace ``decode_image_fake`` with PIL/torchvision in
the same mapper signature — nothing else changes."""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata struct computed JVM-side (no Python): byte length and
    sha2 checksum straight from the binary column."""
    c = F.col(content_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(c).cast("long").alias("n_bytes"),
            F.sha2(c, 256).alias("sha256"),
        ),
    )


def decode_image_real(content: bytes) -> list[float]:
    """The real decoder slot. Container has no imaging libraries — STUB."""
    raise NotImplementedError(
        "image decode requires PIL/torchvision; plug into decode_media_features"
    )


def decode_image_fake(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': sha256-seeded floats in [0,1). Lets
    the full pipeline (schema, batching, downstream ANN) run and be tested
    without media libs."""
    h = hashlib.sha256(content).digest()
    return [b / 255.0 for b in h[:dim]]


def decode_media_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = 8,
    decoder=decode_image_fake,
) -> DataFrame:
    """Arrow-batched decode via mapInPandas: each batch arrives as a pandas
    DataFrame of binary cells; the decoder runs per blob; output is the
    typed FEATURE_SCHEMA. This is the honest shape of a 100 TB media
    pipeline stage: no collect, no UDF-per-row overhead, bounded batches."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[content_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "sha256": blobs.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "crc32": blobs.map(lambda b: zlib.crc32(b)).astype("int64"),
                    "feature": blobs.map(lambda b: decoder(b, dim)),
                }
            )

    return df.mapInPandas(mapper, schema=FEATURE_SCHEMA)


def size_balanced_repartition(
    df: DataFrame,
    content_col: str = "content",
    target_batch_bytes: int = 64 * 1024 * 1024,
    avg_blob_bytes: int | None = None,
) -> DataFrame:
    """Media blobs are heavily size-skewed; hash partitioning by id gives a
    byte-skewed stage. Bucket rows by cumulative-size-friendly salt so each
    task holds ≈ target_batch_bytes (coarse but shuffle-cheap: one pass,
    no global sort)."""
    n_bytes = F.length(F.col(content_col)).cast("long")
    salt_buckets = 1024
    salted = F.abs(F.hash(F.col(content_col))) % salt_buckets
    # weight large blobs into their own buckets
    big = (n_bytes > target_batch_bytes / 8).cast("int")
    return df.repartition(F.concat(salted.cast("string"), F.lit("_"), big.cast("string")))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_image_real(content: bytes, width: int, height: int) -> bytes:
    """The real resize slot. Container has no imaging libraries — STUB."""
    raise NotImplementedError("image resize requires PIL; plug into resize_media")


def resize_image_fake(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: truncate/cycle the blob to width*height bytes
    so output sizes behave like a real resize (smaller target → smaller
    payload) without an imaging lib."""
    need = width * height
    if not content:
        return b"\x00" * need
    reps = -(-need // len(content))
    return (content * reps)[:need]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    resizer=resize_image_fake,
) -> DataFrame:
    """Batch resize via mapInPandas — same Arrow plumbing as the decode
    stage; swap ``resizer`` for a PIL-backed callable in production."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "content": pdf[content_col].map(
                        lambda b: resizer(b, width, height)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(mapper, schema=RESIZED_SCHEMA)


def sample_frames_real(content: bytes, every_n: int) -> list[bytes]:
    """The real frame-sampling slot (video). No av/ffmpeg here — STUB."""
    raise NotImplementedError("frame sampling requires pyav/ffmpeg")


def sample_frames_fake(content: bytes, every_n: int, frame_bytes: int = 16) -> list[bytes]:
    """Deterministic stand-in: treat the blob as fixed-size 'frames' and
    keep every n-th — preserves the fan-out shape (one input row → many
    frame rows) the real sampler produces."""
    frames = [
        content[i : i + frame_bytes] for i in range(0, len(content), frame_bytes)
    ]
    return frames[::every_n]


def sample_media_frames(
    df: DataFrame,
    every_n: int = 2,
    content_col: str = "content",
    id_col: str = "media_id",
    sampler=sample_frames_fake,
) -> DataFrame:
    """Frame sampling as a row-expanding mapInPandas stage: each media row
    yields one row per kept frame. Expansion happens inside the Arrow batch
    (never on the driver), so a long video fans out within its own task."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                for i, fr in enumerate(sampler(blob, every_n)):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(mapper, schema=FRAME_SCHEMA)


def chunk_media(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    chunk_bytes: int = 1 << 20,
) -> DataFrame:
    """Split each binary blob into fixed-size chunks — the plumbing for
    audio-segment / video-GOP / shard-level processing where the downstream
    decoder wants bounded pieces, and for writing large media across
    multiple parquet pages. Pure JVM expressions: sequence() builds the
    chunk index per row, posexplode fans out, substring slices the binary.
    Fan-out is bounded by ceil(n_bytes/chunk_bytes) per row, and each chunk
    row is independently repartitionable (combine with
    size_balanced_repartition before a decode stage)."""
    c = F.col(content_col)
    n_chunks = F.ceil(F.length(c) / F.lit(chunk_bytes)).cast("int")
    return (
        df.select(
            F.col(id_col),
            c.alias("__content"),
            F.posexplode(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
            ).alias("chunk_idx", "_i"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(
                f"substring(__content, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})"
            ).alias("chunk"),
        )
    )

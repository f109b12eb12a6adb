"""Multimodal plumbing tests: binary columns + Arrow-batched decode via
mapInPandas (decode itself is a deterministic fake; SURVEY north-star
multimodal bullet)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image_real,
    decode_media_features,
    size_balanced_repartition,
)


@pytest.fixture(scope="module")
def media(spark):
    # synthesize binary blobs from document text (no media libs in env)
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    ).cache()


def test_metadata_jvm_side(media):
    row = attach_media_metadata(media).filter(F.col("media_id") == 0).first()
    blob = bytes(row["content"])
    assert row["meta"]["n_bytes"] == len(blob)
    assert row["meta"]["sha256"] == hashlib.sha256(blob).hexdigest()


def test_decode_features_deterministic(media):
    out = decode_media_features(media).orderBy("media_id")
    rows = out.collect()
    assert len(rows) == 50
    r0 = rows[0]
    blob = bytes(media.filter(F.col("media_id") == r0["media_id"]).first()["content"])
    assert r0["sha256"] == hashlib.sha256(blob).hexdigest()
    assert len(r0["feature"]) == 8
    assert all(0 <= v < 1 for v in r0["feature"])
    # deterministic: run twice, same features
    again = decode_media_features(media).orderBy("media_id").collect()
    assert [r["feature"] for r in again] == [r["feature"] for r in rows]


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_size_balanced_repartition_runs(media):
    out = size_balanced_repartition(media)
    assert out.count() == 50


def test_resize_media_shapes(spark):
    from feature_store_implementation_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, b"abcdef"), (2, b""), (3, b"x" * 100)], "media_id long, content binary"
    )
    out = {r["media_id"]: r for r in resize_media(df, 4, 3).collect()}
    assert all(len(r["content"]) == 12 for r in out.values())
    assert out[1]["content"] == (b"abcdef" * 2)[:12]
    assert out[2]["content"] == b"\x00" * 12
    assert (out[1]["width"], out[1]["height"]) == (4, 3)


def test_sample_frames_fanout(spark):
    from feature_store_implementation_spark.operators.multimodal import (
        sample_media_frames,
    )

    blob = bytes(range(64))  # 4 frames of 16 bytes
    df = spark.createDataFrame([(7, blob)], "media_id long, content binary")
    rows = sorted(
        sample_media_frames(df, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 1]
    assert rows[0]["frame"] == blob[0:16] and rows[1]["frame"] == blob[32:48]


def test_real_decoders_are_marked_stubs(spark):
    import pytest as _pytest

    from feature_store_implementation_spark.operators import multimodal as mm

    with _pytest.raises(NotImplementedError):
        mm.decode_image_real(b"x")
    with _pytest.raises(NotImplementedError):
        mm.resize_image_real(b"x", 2, 2)
    with _pytest.raises(NotImplementedError):
        mm.sample_frames_real(b"x", 2)

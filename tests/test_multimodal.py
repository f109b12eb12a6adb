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

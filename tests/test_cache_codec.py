"""Unit tests: TTL cache key/eviction semantics (reference cache.py:12-48)
and the value codec round-trip (compute.py:74-79 + main.py:321-325)."""

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_implementation_spark.serving.cache import FeatureCache
from feature_store_implementation_spark.store.codec import (
    decode_value_py,
    encode_value_col,
)


def test_cache_key_reference_parity():
    # cache.py:22-30: md5("entity|sorted-names-joined|version")
    k = FeatureCache.make_key("u1", ["b", "a"], "v1")
    assert k == hashlib.md5(b"u1|a,b|v1").hexdigest()
    # absent parts → empty strings
    assert FeatureCache.make_key("u1") == hashlib.md5(b"u1||").hexdigest()
    # name order must not matter
    assert FeatureCache.make_key("u1", ["x", "y"]) == FeatureCache.make_key("u1", ["y", "x"])


def test_cache_ttl_expiry(monkeypatch):
    c = FeatureCache(maxsize=10, ttl=100)
    t = [1000.0]
    monkeypatch.setattr("time.monotonic", lambda: t[0])
    c.set("k", "v")
    assert c.get("k") == "v"
    t[0] += 101
    assert c.get("k") is None


def test_cache_lru_eviction():
    c = FeatureCache(maxsize=2, ttl=1000)
    c.set("a", 1)
    c.set("b", 2)
    assert c.get("a") == 1  # touch a → b is LRU
    c.set("c", 3)
    assert c.get("b") is None and c.get("a") == 1 and c.get("c") == 3


def test_decode_py_reference_fallback():
    # main.py:321-325: json.loads with raw-string fallback
    assert decode_value_py("15.0") == 15.0
    assert decode_value_py("7") == 7
    assert decode_value_py('{"a": 1}') == {"a": 1}
    assert decode_value_py("[1, 2]") == [1, 2]
    assert decode_value_py("hello") == "hello"
    assert decode_value_py("True") == "True"  # str(True) is not JSON → string
    assert decode_value_py(None) is None


def test_encode_col_roundtrip(spark):
    df = spark.createDataFrame(
        [(1.5, 7, "txt", True, [1, 2], {"a": 1})],
        schema=T.StructType(
            [
                T.StructField("d", T.DoubleType()),
                T.StructField("i", T.LongType()),
                T.StructField("s", T.StringType()),
                T.StructField("b", T.BooleanType()),
                T.StructField("arr", T.ArrayType(T.LongType())),
                T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            ]
        ),
    )
    out = df.select(
        *[
            encode_value_col(F.col(f.name), f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
    ).first()
    assert out["d"] == "1.5" and decode_value_py(out["d"]) == 1.5
    assert out["i"] == "7" and decode_value_py(out["i"]) == 7
    assert out["s"] == "txt"
    assert out["b"] == "True" and decode_value_py(out["b"]) == "True"  # parity
    assert decode_value_py(out["arr"]) == [1, 2]
    assert decode_value_py(out["m"]) == {"a": 1}


def test_encode_null_boolean_stays_null(spark):
    """A NULL boolean must encode to NULL, not \"False\": when().otherwise()
    routes NULL through the otherwise branch, which would mint a concrete
    false for an entity that was never computed — every other dtype
    preserves NULL via cast."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from feature_store_implementation_spark.store.codec import (
        decode_value_py,
        encode_value_col,
    )

    df = spark.createDataFrame(
        [(True,), (False,), (None,)],
        T.StructType([T.StructField("b", T.BooleanType())]),
    )
    out = [
        r["e"]
        for r in df.select(
            encode_value_col(F.col("b"), T.BooleanType()).alias("e")
        ).collect()
    ]
    assert out == ["True", "False", None]
    assert decode_value_py(out[2]) is None

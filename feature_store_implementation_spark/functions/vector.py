"""Vector math over ``array<float>`` columns via Spark higher-order
functions — JVM-side, codegen-friendly, no Python in the loop.

Accumulation is a sequential left fold (``F.aggregate``), so the float
summation order is deterministic — required for oracle hash-matching and for
reproducible top-k ranking."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double (deterministic left-to-right fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL on zero-norm inputs rather than NaN."""
    denom = l2_norm_col(a) * l2_norm_col(b)
    return F.when(denom != 0.0, dot_col(a, b) / denom)


def int8_quantize_col(a: Column) -> Column:
    """Symmetric int8 quantization of an ``array<float>`` embedding: each
    component mapped to round(x * 127 / max|x|) as TINYINT, plus the scale
    needed to dequantize. 4× smaller vectors make brute-force and IVF scans
    proportionally cheaper at 100 TB; all arithmetic is a JVM-side
    higher-order function (no Python in the path). Zero vectors quantize to
    all-zero with scale 0. Returns a struct (q: array<tinyint>, scale:
    float)."""
    mx = F.array_max(F.transform(a, lambda x: F.abs(x)))
    q = F.transform(
        a,
        lambda x: F.when(mx == 0, F.lit(0))
        .otherwise(F.round(x.cast("double") * 127.0 / mx.cast("double")))
        .cast("tinyint"),
    )
    return F.struct(q.alias("q"), (mx / 127.0).cast("float").alias("scale"))


def int8_dequantize_col(qs: Column) -> Column:
    """Inverse of :func:`int8_quantize_col`: q * scale back to array<float>
    (lossy — within scale/2 per component)."""
    return F.transform(qs["q"], lambda v: (v.cast("float") * qs["scale"]).cast("float"))

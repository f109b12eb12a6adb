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

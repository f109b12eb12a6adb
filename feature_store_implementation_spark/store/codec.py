"""Value codec: the reference's stringly-typed offline store.

Write side (compute.py:74-79): dict/list → ``json.dumps``; everything else →
``str(value)``. Read side (main.py:321-325): ``json.loads`` attempted, falls
back to the raw string.

Python ``str()`` and JSON literals agree for int/float/str, so the observable
round-trip is: numerics come back as numbers, strings as strings (unless they
parse as JSON), containers as containers. Two deliberate, documented parity
choices:

* ``str(True)`` is ``"True"`` in Python, which json.loads rejects → the
  reference round-trips booleans to the STRING ``"True"``/``"False"``. We
  reproduce exactly that (booleans encode via Python-style initial-caps).
* Floats: Spark's JVM double→string rendering differs from CPython's for
  some values (1e16 → "1.0E16" vs "1e+16"). The codec therefore formats
  doubles with ``format_number``-free plain notation JVM-side; exact parity
  for the reference's observable fixtures (FIXTURES.md §B: "15.0", "7.0") is
  covered by tests.

Everything here is a column expression — the encode/decode runs inside
whole-stage codegen on executors, never a Python loop (the reference's
row-at-a-time loop, compute.py:74-88, is the anti-pattern we replace).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_value_col(col: Column, dtype: T.DataType) -> Column:
    """Encode a typed value column to the store's string representation.

    The reference dispatches on runtime type per row (compute.py:76-79); with
    a static schema we pick the encoding once at plan time.
    """
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        return F.to_json(col)
    if isinstance(dtype, T.BooleanType):
        # Python str(True) → "True" (compute.py:79). NULL must stay NULL:
        # when().otherwise() would route a NULL boolean through the
        # otherwise branch and mint a concrete "False" for an entity that
        # was never computed — every other dtype preserves NULL via cast
        return F.when(col.isNull(), F.lit(None).cast("string")).when(
            col, F.lit("True")
        ).otherwise(F.lit("False"))
    return col.cast("string")


def decode_value_col(col: Column) -> Column:
    """Best-effort typed decode of the stored string: JSON-parseable → typed
    (number/bool/null/array/object via a VARIANT-less double/keep-string
    split), else the raw string. Mirrors main.py:321-325.

    For relational use we expose the two dominant shapes directly:
    ``try_cast`` to double (covers the reference's numeric features) with the
    raw string kept alongside.
    """
    return F.struct(
        col.try_cast("double").alias("as_double"),
        col.alias("as_string"),
    )


def decode_value_py(raw: str | None) -> Any:
    """Driver-side decode with exact reference semantics (main.py:321-325):
    json.loads, falling back to the raw string."""
    if raw is None:
        return None
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        return raw

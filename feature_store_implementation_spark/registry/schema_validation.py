"""Raw-data schema validation against a registered schema_definition.

Reference: compute.py:91-122 — two recognized keys (``required_columns``,
``column_types``) and two enforced type names (``numeric``, ``string``); any
other declared type is accepted unchecked (compute.py:115-120)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from ..errors import SchemaValidationError

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def validate_raw_data_schema(schema: T.StructType, schema_definition: dict[str, Any]) -> None:
    """Raise :class:`SchemaValidationError` on missing required columns or
    declared-type mismatch; silently accept unknown type names, matching the
    reference's permissive behavior (compute.py:115 ``if expected_type ==``
    chains with no else)."""
    if not schema_definition:
        return
    names = {f.name for f in schema.fields}
    required = schema_definition.get("required_columns", [])
    missing = [c for c in required if c not in names]
    if missing:
        raise SchemaValidationError(f"Missing required columns: {missing}")

    by_name = {f.name: f.dataType for f in schema.fields}
    for col, expected in (schema_definition.get("column_types") or {}).items():
        if col not in by_name:
            continue  # reference only checks present columns (compute.py:112)
        actual = by_name[col]
        if expected == "numeric":
            if not isinstance(actual, _NUMERIC):
                raise SchemaValidationError(
                    f"Column '{col}' should be numeric, got {actual.simpleString()}"
                )
        elif expected == "string":
            if not isinstance(actual, T.StringType):
                raise SchemaValidationError(
                    f"Column '{col}' should be string, got {actual.simpleString()}"
                )
        # any other declared type: unchecked, by design

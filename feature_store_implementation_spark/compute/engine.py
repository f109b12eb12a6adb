"""The computation surface: what replaces the reference's ``exec`` sandbox.

The reference binds ``{pd, df, raw_data}`` and ``exec``s arbitrary Python
that must assign ``result`` = per-entity Series (compute.py:30-55). That is
unsafe (the ``{"__builtins__": {}}`` sandbox is escapable, SURVEY §1.5) and
opaque to any optimizer. Our ``computation_logic`` is a *declared* surface
with three forms, in decreasing Catalyst visibility:

1. **Aggregate SQL expression** — e.g. ``"SUM(amount)"`` or
   ``"COUNT(DISTINCT item) + 1"``: evaluated as
   ``df.groupBy(entity).agg(expr(...))``. Fully optimized (partial
   aggregation, codegen, pushdown).
2. **Row SQL expression** — prefix ``row:`` e.g. ``"row: amount * 2"``:
   one value per input row; the entity column must be unique per row.
3. **Registered transform** — prefix ``transform:<name>``: a Python
   ``fn(DataFrame, entity_col) -> DataFrame(entity_id, value)`` registered
   via :func:`register_transform` — the honest replacement for arbitrary
   pandas programs, still whole-DataFrame (use built-in ops inside;
   ``applyInPandas`` only when semantics require).

All three return a two-column DataFrame ``(entity_id: string, value: <typed>)``
— the Spark equivalent of the reference's entity-indexed Series
(compute.py:46-55)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ComputationError

TRANSFORMS: dict[str, Callable[[DataFrame, str], DataFrame]] = {}


def register_transform(name: str):
    """Register a named whole-DataFrame transform usable as
    ``computation_logic = "transform:<name>"``."""

    def deco(fn: Callable[[DataFrame, str], DataFrame]):
        TRANSFORMS[name] = fn
        return fn

    return deco


def _entity_col(df: DataFrame, entity_id_column: str) -> Column:
    if entity_id_column not in df.columns:
        # reference: 400 "Column 'X' not found in data" (main.py:178-188)
        raise ComputationError(
            f"Entity ID column '{entity_id_column}' not found in data"
        )
    return F.col(entity_id_column).cast("string")


def compute_feature(
    df: DataFrame, computation_logic: str, entity_id_column: str = "id"
) -> DataFrame:
    """Evaluate ``computation_logic`` against ``df`` → (entity_id, value).

    Mirrors compute.py:9-58's contract: exactly one value column, keyed by
    entity; anything else raises :class:`ComputationError`."""
    logic = computation_logic.strip()
    entity = _entity_col(df, entity_id_column)
    try:
        if logic.startswith("transform:"):
            name = logic[len("transform:") :].strip()
            if name not in TRANSFORMS:
                raise ComputationError(f"Unknown transform '{name}'")
            out = TRANSFORMS[name](df, entity_id_column)
            if set(out.columns) != {"entity_id", "value"}:
                raise ComputationError(
                    "Transform must return columns (entity_id, value), got "
                    f"{out.columns}"  # compute.py:49-53 multi-col rejection
                )
            return out.select(F.col("entity_id").cast("string"), "value")
        if logic.startswith("row:"):
            expr = logic[len("row:") :].strip()
            return df.select(entity.alias("entity_id"), F.expr(expr).alias("value"))
        # default: aggregate expression per entity
        return (
            df.groupBy(entity.alias("entity_id"))
            .agg(F.expr(logic).alias("value"))
        )
    except ComputationError:
        raise
    except Exception as e:  # analysis errors → ComputationError (main.py:202-206)
        raise ComputationError(f"Computation failed: {e}") from e


def ewm_features(
    df,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
):
    """Per-entity exponentially-weighted mean (pandas ``.ewm(alpha).mean()``
    semantics, adjust=True) — the recursive time-series smoother the
    reference's sandbox gets from pandas and plain SQL windows cannot
    express exactly. Arrow-batched ``applyInPandas`` per entity: the group
    is sorted by ``order_cols`` (deterministic tie-break required) and
    smoothed with pandas itself, so semantics are pandas-exact by
    construction. State is O(1) per row; groups stream through Python at
    Arrow speed — the right trade for a genuinely sequential recurrence."""
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401 (kept for symmetry)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(key_col, *order_cols, value_col).schema.fields
    ) + ", ewm double"

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        pdf["ewm"] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean().round(6)
        return pdf

    return (
        df.select(key_col, *order_cols, value_col)
        .groupBy(key_col)
        .applyInPandas(smooth, schema=out_schema)
    )

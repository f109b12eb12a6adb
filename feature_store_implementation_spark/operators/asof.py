"""As-of (point-in-time) join — the one classically-hard feature-store
operator (SURVEY §2.C joins, §7 hard-part 1).

The reference's users would reach for ``pd.merge_asof`` inside the ``exec``
sandbox (compute.py:38); Spark has no built-in. The scalable pattern is the
**union + window carry-forward**:

1. Tag left rows (probe) and right rows (state), union them on
   ``(by, ts)``.
2. One window per ``by`` key ordered by ``(ts, side)`` — right rows sort
   BEFORE left rows at equal ts, so "backward inclusive" semantics fall out
   of the frame ``rowsBetween(unboundedPreceding, currentRow)``.
3. ``last(payload, ignoreNulls=True)`` carries the most recent right payload
   forward; keep left rows only.

Cost: ONE shuffle of |left| + |right| rows on the by-key (same as any
groupBy), no range explosion, no crossJoin — this is what survives 100 TB,
unlike per-key collect or a t1 ≤ t2 theta-join (which Spark would execute as
a broadcast-nested-loop over the whole fact table). Skewed by-keys are
handled by AQE skew-split since the window is preceded by a standard
hash-partition exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (backward as-of,
    ``pd.merge_asof`` defaults).

    Parameters
    ----------
    on : ordering (timestamp) column name, present in both sides.
    by : equi-key column(s) present in both sides.
    value_cols : right-side payload columns to carry (default: all right
        columns except ``on``/``by``).
    tolerance : optional max staleness as an INTERVAL literal (e.g.
        ``'3600 seconds'``); matches older than it are nulled, like
        merge_asof(tolerance=...).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {on, *by_cols}]

    carried = [f"{c}{suffix}" for c in value_cols]
    # side marker: right=0 sorts before left=1 at equal ts → inclusive match
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_rts", F.lit(None).cast("timestamp"))
    for c, cc in zip(value_cols, carried):
        lhs = lhs.withColumn(cc, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *by_cols,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        F.col(on).cast("timestamp").alias("_rts"),
        *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
    )
    # align schemas for unionByName
    lhs_cols = set(lhs.columns)
    rhs = rhs.select(
        *[
            F.lit(None).cast(lhs.schema[c].dataType).alias(c) if c not in rhs.columns else F.col(c)
            for c in lhs.columns
        ]
    )
    _ = lhs_cols

    unioned = lhs.unionByName(rhs)
    w = (
        W.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = unioned.select(
        *left.columns,
        "_side",
        *[F.last(cc, ignorenulls=True).over(w).alias(cc) for cc in carried],
        F.last("_rts", ignorenulls=True).over(w).alias("_matched_ts"),
    ).filter(F.col("_side") == 1)

    if tolerance is not None:
        stale = F.col(on).cast("timestamp") - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *left.columns,
            *[
                F.when(F.col("_matched_ts") >= stale, F.col(cc)).alias(cc)
                for cc in carried
            ],
        )
    else:
        out = out.select(*left.columns, *carried)
    return out

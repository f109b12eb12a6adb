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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row within the same
    ``by`` group (``pd.merge_asof`` semantics).

    Parameters
    ----------
    on : ordering (timestamp) column name, present in both sides.
    by : equi-key column(s) present in both sides.
    value_cols : right-side payload columns to carry (default: all right
        columns except ``on``/``by``).
    tolerance : optional max distance as an INTERVAL literal (e.g.
        ``'3600 seconds'``); matches farther than it are nulled, like
        merge_asof(tolerance=...).
    direction : ``'backward'`` (most recent right.on <= left.on, default),
        ``'forward'`` (earliest right.on >= left.on), or ``'nearest'``
        (closer of the two; exact-distance ties resolve backward). Forward
        is the same one-shuffle carry with the scan order reversed; nearest
        evaluates both windows over the SAME partitioning (one shuffle, two
        local sorts) and picks per-row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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

    def window(reverse: bool):
        order = F.col(on).desc() if reverse else F.col(on).asc()
        return (
            W.partitionBy(*by_cols)
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )

    lts = F.col(on).cast("timestamp")
    if direction in ("backward", "forward"):
        w = window(reverse=direction == "forward")
        out = unioned.select(
            *left.columns,
            "_side",
            *[F.last(cc, ignorenulls=True).over(w).alias(cc) for cc in carried],
            F.last("_rts", ignorenulls=True).over(w).alias("_matched_ts"),
        ).filter(F.col("_side") == 1)
        if tolerance is not None:
            tol = F.expr(f"INTERVAL {tolerance}")
            in_tol = (
                F.col("_matched_ts") >= lts - tol
                if direction == "backward"
                else F.col("_matched_ts") <= lts + tol
            )
            return out.select(
                *left.columns,
                *[F.when(in_tol, F.col(cc)).alias(cc) for cc in carried],
            )
        return out.select(*left.columns, *carried)

    # nearest: both directions over one partitioning, choose per row
    wb, wf = window(False), window(True)
    both = unioned.select(
        *left.columns,
        "_side",
        *[F.last(cc, ignorenulls=True).over(wb).alias(f"{cc}__b") for cc in carried],
        F.last("_rts", ignorenulls=True).over(wb).alias("_mts_b"),
        *[F.last(cc, ignorenulls=True).over(wf).alias(f"{cc}__f") for cc in carried],
        F.last("_rts", ignorenulls=True).over(wf).alias("_mts_f"),
    ).filter(F.col("_side") == 1)
    d_b = lts.cast("long") - F.col("_mts_b").cast("long")
    d_f = F.col("_mts_f").cast("long") - lts.cast("long")
    use_b = F.col("_mts_f").isNull() | (F.col("_mts_b").isNotNull() & (d_b <= d_f))
    picked_ts = F.when(use_b, F.col("_mts_b")).otherwise(F.col("_mts_f"))
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        in_tol = (picked_ts >= lts - tol) & (picked_ts <= lts + tol)
    else:
        in_tol = F.lit(True)
    return both.select(
        *left.columns,
        *[
            F.when(
                in_tol, F.when(use_b, F.col(f"{cc}__b")).otherwise(F.col(f"{cc}__f"))
            ).alias(cc)
            for cc in carried
        ],
    )

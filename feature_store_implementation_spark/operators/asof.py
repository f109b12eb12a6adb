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
    # The ENTIRE matched right row travels as ONE struct ("_pay"): carrying
    # each payload column independently with last(ignorenulls=True) is
    # wrong twice over — a matching right row's LEGITIMATE NULL payload
    # would be replaced by a stale value from an older right row (the
    # ignorenulls needed to skip left-row filler NULLs also skips real
    # ones), and different value columns could come from DIFFERENT right
    # rows. The struct is non-null for every right row even when all its
    # fields are null, so ignorenulls skips exactly the left-row fillers.
    # _rts rides inside the struct: the matched timestamp and the matched
    # payload are one consistent row by construction.
    # side marker: right=0 sorts before left=1 at equal ts → inclusive match
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        *by_cols,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(on).cast("timestamp").alias("_rts"),
            *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
        ).alias("_pay"),
    )
    # left rows get NULL _pay, right rows NULL left-only columns
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    def window(reverse: bool):
        order = F.col(on).desc() if reverse else F.col(on).asc()
        return (
            W.partitionBy(*by_cols)
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )

    lts = F.col(on).cast("timestamp")

    def project(pay, in_tol):
        return [
            F.when(in_tol, pay.getField(cc)).alias(cc) for cc in carried
        ]

    if direction in ("backward", "forward"):
        w = window(reverse=direction == "forward")
        out = unioned.select(
            *left.columns,
            "_side",
            F.last("_pay", ignorenulls=True).over(w).alias("_pay"),
        ).filter(F.col("_side") == 1)
        pay = F.col("_pay")
        matched_ts = pay.getField("_rts")
        if tolerance is not None:
            tol = F.expr(f"INTERVAL {tolerance}")
            in_tol = (
                matched_ts >= lts - tol
                if direction == "backward"
                else matched_ts <= lts + tol
            )
        else:
            in_tol = matched_ts.isNotNull()
        return out.select(*left.columns, *project(pay, in_tol))

    # nearest: both directions over one partitioning, choose per row.
    # Distances compare in MICROseconds — cast('long') truncates to whole
    # seconds and picks the farther side on sub-second data.
    wb, wf = window(False), window(True)
    both = unioned.select(
        *left.columns,
        "_side",
        F.last("_pay", ignorenulls=True).over(wb).alias("_pb"),
        F.last("_pay", ignorenulls=True).over(wf).alias("_pf"),
    ).filter(F.col("_side") == 1)
    mts_b = F.col("_pb").getField("_rts")
    mts_f = F.col("_pf").getField("_rts")
    d_b = F.unix_micros(lts) - F.unix_micros(mts_b)
    d_f = F.unix_micros(mts_f) - F.unix_micros(lts)
    use_b = mts_f.isNull() | (mts_b.isNotNull() & (d_b <= d_f))
    picked = F.when(use_b, F.col("_pb")).otherwise(F.col("_pf"))
    picked_ts = picked.getField("_rts")
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        in_tol = (picked_ts >= lts - tol) & (picked_ts <= lts + tol)
    else:
        in_tol = picked_ts.isNotNull()
    return both.select(*left.columns, *project(picked, in_tol))

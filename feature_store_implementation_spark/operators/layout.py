"""Z-order (Morton) data layout for multi-dimensional scan pruning.

Parquet row-group min/max statistics prune scans only along the sort order:
a lake sorted by ``ship_date`` answers date filters with narrow file ranges
but reads EVERYTHING for a ``supplier`` filter. Interleaving the bits of
several columns' fixed-point ranks gives a single sort key whose locality is
shared across all of them — each file then covers a small hyper-rectangle of
the key space, so min/max pruning works on every participating column at
once. This is the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
implemented here as plain JVM-side expressions + a range repartition (no
Python in the path, no extra shuffle beyond the one any sorted write needs).

The reference has no storage layout control at all (single SQLite file,
database.py:8); at 100 TB layout IS the difference between reading one file
and reading the lake. Effectiveness is asserted in tests/test_layout.py by
reading back the parquet footers: the per-file bounding-box area of the
z-ordered layout must be a fraction of a linearly-sorted one's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fixed_point_rank(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column to an integer rank in [0, 2^bits) using the
    column's [lo, hi] range — monotonic, so z-curve locality follows value
    locality. Degenerate (constant) columns map to 0."""
    span = (hi.cast("double") - lo.cast("double"))
    frac = F.when(span == 0, F.lit(0.0)).otherwise(
        (col.cast("double") - lo.cast("double")) / span
    )
    max_rank = (1 << bits) - 1
    return F.least(
        F.lit(max_rank).cast("long"),
        F.floor(frac * F.lit(max_rank + 1)).cast("long"),
    )


def zvalue(ranks: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each rank column into one Morton key —
    pure shift/or expressions, fully codegen'd.

    Requires ``len(ranks) * bits <= 63``: the key is a signed 64-bit long and
    JVM shift counts wrap mod 64, so an oversized column set would silently
    corrupt the key (and the clustering it exists to provide) instead of
    failing. Callers with many columns should reduce ``bits`` (e.g. 6 columns
    → bits<=10)."""
    n = len(ranks)
    if n * bits > 63:
        raise ValueError(
            f"zvalue: {n} columns x {bits} bits = {n * bits} key bits > 63; "
            f"reduce bits to <= {63 // n} to fit a 64-bit Morton key"
        )
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out


def zorder_keyed(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """``df`` plus a ``__z`` Morton-key column over ``cols``.

    Column ranges come from one cheap min/max aggregate (broadcast back —
    O(1) rows); each column is fixed-point-ranked against its range and the
    ranks' bits interleave into the key. The whole computation is JVM
    expressions — usable standalone (e.g. as a clustering/bucketing key for
    a downstream range partitioner) or via :func:`zorder_write`."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    ranks = [
        _fixed_point_rank(
            F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in cols
    ]
    return with_bounds.withColumn("__z", zvalue(ranks, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of ``cols``.

    Rows are range-partitioned and sorted by the Morton key
    (:func:`zorder_keyed`) so each output file covers a compact
    hyper-rectangle. ``num_files`` controls output fan-out (defaults to
    the current parallelism)."""
    keyed = zorder_keyed(df, cols, bits)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )

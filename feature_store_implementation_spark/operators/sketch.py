"""Distributed exact heavy hitters: Misra-Gries candidate generation plus an
exact recount.

The reference's only route to "most frequent values" is a full pandas
``value_counts`` inside its per-entity exec sandbox (reference
compute.py:30-55) — single-node, whole-column materialization. At 100 TB a
full ``groupBy(col).count()`` shuffles one record per *distinct value*,
which for high-cardinality columns (urls, ngrams, user ids) is itself
enormous when all we want is the handful of values above a frequency
threshold.

The classic two-phase trick keeps the answer EXACT while shuffling almost
nothing:

1. **Candidate generation (map-side, no shuffle).** Each partition runs a
   Misra-Gries summary with ``k`` counters over its local rows
   (``mapInPandas``, Arrow-batched). MG guarantees any item with local count
   > n_p/k survives in partition p's counter set; by pigeonhole, any item
   with GLOBAL count > n/k must exceed n_p/k in at least one partition, so
   the union of per-partition survivors is a superset of the true heavy
   hitters. At most ``k`` candidates leave each partition regardless of
   partition size.
2. **Exact recount (one semi-join + one tiny shuffle).** The deduplicated
   candidate set (≤ k·partitions values, typically minuscule) is broadcast
   back; only matching rows are counted. ``HAVING count > n/k`` then removes
   MG's false positives.

The result is bit-for-bit the same as ``GROUP BY ... HAVING count(*) >
n/k`` — which is exactly how the oracle checks it — but the only wide
shuffle is over candidate values, not all distinct values.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(col: str, k: int):
    """Per-partition Misra-Gries: stream batches, keep at most k counters.

    Besides the ≤k surviving candidate values, each partition emits ONE
    marker row (``col`` NULL) carrying the partition's total row count and
    NULL-key count — so the global n (for the n/k threshold) and the NULL
    group's exact count fall out of the same single scan instead of needing
    a separate ``df.count()`` pass. Candidate rows can never collide with
    the marker: NULL is excluded from the counter set by construction.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        part_rows = 0
        part_nulls = 0
        for pdf in batches:
            part_rows += len(pdf)
            part_nulls += int(pdf[col].isna().sum())
            # batched Misra-Gries, fully vectorized (an item-at-a-time dict
            # fold rebuilds O(k) state per eviction — ~30M Python dict ops
            # per partition at k=1500 over TPC-H part keys): merge the
            # batch's exact counts, then — if over k counters — apply ONE
            # collective decrement d = the (k+1)-th largest count and drop
            # non-positives. Equivalent to a run of unit MG decrement
            # rounds: each round of d removes d mass from ≥ k+1 counters,
            # so total decremented mass stays ≤ n/(k+1), and every value
            # with true count > n/k still survives — all the recount needs.
            bc = pdf[col].value_counts(dropna=True).astype("int64")
            counters = bc if counters.empty else counters.add(bc, fill_value=0)
            if len(counters) > k:
                d = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > d] - d
        values = list(counters.index)
        yield pd.DataFrame(
            {
                col: values + [None],
                "_part_rows": [0] * len(values) + [part_rows],
                "_part_nulls": [0] * len(values) + [part_nulls],
            }
        )

    return run


def frequent_items(df: DataFrame, col: str, k: int) -> DataFrame:
    """All values of ``col`` whose exact count exceeds n/k, with exact counts.

    Returns ``(col, cnt)``. Output is EXACT (not approximate): Misra-Gries
    only proposes candidates; counts come from a recount restricted to them.
    NULL keys are handled the way SQL ``GROUP BY ... HAVING`` does: their
    exact count comes from the marker rows of the candidate pass (a
    broadcast semi-join cannot match NULL), and a ``(NULL, cnt)`` row is
    emitted when it clears the threshold — bit-for-bit the GROUP BY answer
    for nullable columns too.

    Exactly two scans of ``df``: the map-side MG candidate pass (which also
    totals rows and NULL keys per partition) and the recount.
    """
    key_type = df.select(col).schema[0].dataType.simpleString()
    summary = (
        df.select(col)
        .mapInPandas(
            _misra_gries_partition(col, k),
            schema=f"`{col}` {key_type}, _part_rows long, _part_nulls long",
        )
        # two downstream reads (totals + candidate set) of a ≤(k+1)·P-row
        # frame: materialize once so the MG scan of df runs once
        .localCheckpoint(eager=True)
    )
    n, n_nulls = summary.agg(
        F.sum("_part_rows").cast("long"), F.sum("_part_nulls").cast("long")
    ).first()
    n = n or 0  # empty input: no marker rows at all
    candidates = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    out = (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > F.lit(n) / F.lit(k))
    )
    if n_nulls and n_nulls * k > n:
        null_row = df.sparkSession.createDataFrame(
            [(None, n_nulls)], schema=f"`{col}` {key_type}, cnt long"
        )
        out = out.unionByName(null_row)
    return out


def theta_overlap(
    a: DataFrame,
    b: DataFrame,
    col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Set-operation cardinalities between two frames' ``col`` values —
    the audience-overlap / cohort-retention shape: how many distinct
    users/parts/docs appear in BOTH a and b, in either, or only in a.
    Built on Spark's Datasketches THETA sketches (``theta_sketch_agg`` +
    ``theta_intersection``/``theta_union``/``theta_difference``): unlike
    HLL, theta supports intersections and differences, which is why this
    exists alongside the rollup's ``hll`` column.

    Each side aggregates to one sketch per group (map-side combinable,
    one tiny shuffle of sketch bytes), the two sketch frames join on
    ``keys`` (broadcast when small; no raw values cross), and the set
    estimates read off JVM-side. Returns ``keys + (n_a, n_b,
    n_intersection, n_union, n_only_a)``.

    Exactness: a theta sketch is EXACT below its nominal entry count
    (default 4,096 distinct values) and a sampled estimate beyond — so
    small/medium group overlaps are exact (the oracle-checked driver
    regime at sf0.01) and 100 TB-cardinality overlaps degrade to the
    published relative-error bound instead of failing."""
    keys = keys or []

    def sk(df: DataFrame, alias: str) -> DataFrame:
        agg = F.theta_sketch_agg(col).alias(alias)
        return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)

    sa, sb = sk(a, "ta"), sk(b, "tb")
    joined = sa.join(sb, keys) if keys else sa.crossJoin(sb)
    return joined.select(
        *keys,
        F.theta_sketch_estimate("ta").cast("long").alias("n_a"),
        F.theta_sketch_estimate("tb").cast("long").alias("n_b"),
        F.theta_sketch_estimate(F.theta_intersection("ta", "tb"))
        .cast("long")
        .alias("n_intersection"),
        F.theta_sketch_estimate(F.theta_union("ta", "tb"))
        .cast("long")
        .alias("n_union"),
        F.theta_sketch_estimate(F.theta_difference("ta", "tb"))
        .cast("long")
        .alias("n_only_a"),
    )

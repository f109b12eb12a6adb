"""Skew-mitigation operators for hot-key joins and high-cardinality
aggregation.

At 100 TB a handful of hot keys (one power user in ``events``, one viral
document) can pin a single reducer for hours while 999 executors idle. AQE's
skew-join split (enabled in session.py) handles sort-merge skew at runtime;
these operators are the *declared* counterparts for when the plan must be
skew-proof by construction — e.g. writing a pipeline that is replayed on
clusters where AQE thresholds aren't tuned, or aggregations AQE cannot split
(a single giant group).

Semantics are identity-preserving: ``salted_join`` returns exactly the rows
of the plain equi-join, ``two_phase_count_distinct`` exactly the plain
COUNT(DISTINCT) — both are oracle-checked in plans/inventory.py against the
un-salted SQL.

The reference has no analogue (single-process pandas, reference compute.py);
this is pure scale engineering the Spark target demands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__fsis_salt"


def detect_hot_keys(
    df: DataFrame, key: str, top_n: int = 50, min_share: float = 0.001
) -> list:
    """Find join keys heavy enough to deserve salting: the top-N keys by
    frequency holding at least ``min_share`` of all rows. One aggregation
    job over the key column only (column-pruned scan); run it on a sample
    when even that is too much: ``df.sample(0.01)`` shifts shares, not the
    identity of truly hot keys."""
    total = df.count()
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), key)
        .limit(top_n)
        .collect()
    )
    return [r[key] for r in rows if r["__n"] >= max(total * min_share, 2)]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join where hot keys on the (large, skewed) ``left`` are spread
    across ``salt`` sub-partitions and the matching ``right`` rows are
    replicated ``salt`` times — only for the hot keys, so the replication
    cost is |hot| × salt rows, not |right| × salt.

    The salt on the left is derived from a hash of the whole row (pmod into
    [0, salt)): deterministic for a given row, uniform across rows of the
    same key, and invisible in the output (the salt column is dropped).
    Result is row-identical to ``left.join(right, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, on)
    if not hot_keys:
        return left.join(right, on, how)

    def is_hot(c: Column) -> Column:
        return c.isin(list(hot_keys))

    left_s = left.withColumn(
        SALT,
        F.when(
            is_hot(F.col(on)), F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
        ).otherwise(F.lit(0)),
    )
    right_s = (
        right.withColumn(
            "__salts",
            F.when(
                is_hot(F.col(on)),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn(SALT, F.explode("__salts"))
        .drop("__salts")
    )
    return left_s.join(right_s, [on, SALT], how).drop(SALT)


def two_phase_count_distinct(
    df: DataFrame, group_keys: list[str], distinct_col: str, salt: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per group without shuffling every (group, x)
    pair to one reducer per group. Phase 1 hashes the *distinct value* into
    ``salt`` disjoint buckets and counts distinct within (group, bucket);
    because the buckets partition the value space, phase 2 just SUMs them.
    Exact (not a sketch) and the hottest group now spreads over ``salt``
    reducers. Output column: ``n_distinct``."""
    bucket = F.pmod(F.hash(F.col(distinct_col)), F.lit(salt)).alias("__bucket")
    phase1 = df.groupBy(*group_keys, bucket).agg(
        F.countDistinct(distinct_col).alias("__partial")
    )
    return phase1.groupBy(*group_keys).agg(
        F.sum("__partial").cast("long").alias("n_distinct")
    )

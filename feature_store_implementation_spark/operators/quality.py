"""Declarative data-quality expectations, evaluated in ONE scan.

A training-data pipeline gates ingestion on data contracts: null-rate,
uniqueness, value ranges, accepted vocabularies, pattern shape, referential
integrity. The reference validates only column presence and two dtypes
(reference compute.py:106-120); everything else silently flows through.

Design for scale: every column-local expectation compiles to a conditional
aggregate in a SINGLE ``agg`` over the table — one scan, map-side partials,
no per-rule pass. The wide one-row result is then unpivoted (``stack``) to
the long (check, violations) report. Referential checks need the parent's
key set, so they compile to a broadcast anti-join counted in the same job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declared contract. ``kind`` ∈ {not_null, unique, in_range,
    accepted_values, matches_regex, foreign_key}."""

    name: str
    column: str
    kind: str
    params: dict = field(default_factory=dict)


def _violation_expr(e: Expectation) -> Column:
    c = F.col(e.column)
    if e.kind == "not_null":
        return F.count(F.when(c.isNull(), 1))
    if e.kind == "unique":
        # duplicates = rows - distinct keys (exact; swap for HLL at 100 TB
        # if an approximate gate is acceptable)
        return F.count(c) - F.count_distinct(c)
    if e.kind == "in_range":
        lo, hi = e.params["min"], e.params["max"]
        return F.count(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1))
    if e.kind == "accepted_values":
        vals = e.params["values"]
        return F.count(F.when(c.isNotNull() & ~c.isin(*vals), 1))
    if e.kind == "matches_regex":
        return F.count(F.when(c.isNotNull() & ~c.rlike(e.params["pattern"]), 1))
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def check_expectations(
    df: DataFrame,
    expectations: list[Expectation],
    parents: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate all expectations; returns (check, violations, passed).

    ``parents`` maps an expectation name to its parent-key DataFrame for
    ``foreign_key`` kinds (params: ``parent_key`` column name)."""
    local = [e for e in expectations if e.kind != "foreign_key"]
    fks = [e for e in expectations if e.kind == "foreign_key"]

    aggs = [
        _violation_expr(e).cast("long").alias(e.name) for e in local
    ]
    frames: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{e.name}', `{e.name}`" for e in local)
        frames.append(
            wide.selectExpr(
                f"stack({len(local)}, {stack}) as (check, violations)"
            )
        )
    for e in fks:
        parent = (parents or {})[e.name]
        pk = e.params["parent_key"]
        orphans = (
            df.select(F.col(e.column))
            .filter(F.col(e.column).isNotNull())
            .join(
                F.broadcast(parent.select(F.col(pk).alias(e.column)).distinct()),
                e.column,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(F.lit(e.name).alias("check"), "violations")
        )
        frames.append(orphans)

    if not frames:
        # an empty (e.g. dynamically-built) expectation list is a valid
        # "nothing to check" — an empty typed report, not an IndexError
        return df.sparkSession.createDataFrame(
            [], "check string, violations long, passed boolean"
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.withColumn("passed", F.col("violations") == 0)


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier detection via median / MAD (median absolute
    deviation) — the standard replacement for mean±k·σ when the value
    distribution has heavy tails (a single corrupt 1e12 row drags a mean
    gate open; it cannot move a median).

    Returns one row per group: n, median, mad, n_outliers (rows with
    |value − median| > k·MAD) and outlier_frac.

    Plan: two grouped EXACT percentile aggregations (Spark's sort-based
    `percentile`, partial-merge capable) with the per-group medians joined
    back broadcast — group cardinality is dim-sized, values never collect
    to the driver. Medians are rounded to 4 dp before the deviation pass so
    the interpolated midpoint's last ulp can't differ from the oracle's
    quantile_cont."""
    med = df.groupBy(*group_cols).agg(
        F.round(F.percentile(F.col(value_col), F.lit(0.5)), 4).alias("med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.first("med").alias("med"),
        F.round(F.percentile(F.col("_absdev"), F.lit(0.5)), 4).alias("mad"),
    )
    flagged = dev.drop("med").join(F.broadcast(mad), group_cols)
    return flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("med").alias("median_v"),
        F.first("mad").alias("mad_v"),
        F.sum(
            (F.col("_absdev") > F.lit(k) * F.col("mad")).cast("long")
        ).cast("long").alias("n_outliers"),
    ).select(
        *group_cols,
        "n",
        "median_v",
        "mad_v",
        "n_outliers",
        F.round(F.col("n_outliers") / F.col("n"), 6).alias("outlier_frac"),
    )


def observed_expectations(df: DataFrame, expectations: list[Expectation]):
    """Attach data-quality counters to a DataFrame as Spark ``Observation``
    metrics: ``(df2, observation)`` where ``df2`` is semantically identical
    and the observation, once ANY action runs over ``df2`` (typically the
    production write itself), yields ``n_rows`` plus one violation count
    per expectation — the zero-extra-scan form of :func:`check_expectations`
    for 100 TB pipelines, where a dedicated validation pass would double
    the read. Metrics piggyback on the pass the pipeline already makes.
    Only single-pass aggregable kinds are supported: ``foreign_key`` needs
    a join and ``unique`` needs DISTINCT state (both rejected by Spark's
    observed-metrics analyzer) — use :func:`check_expectations` for
    those."""
    from pyspark.sql import Observation

    for e in expectations:
        if e.kind in ("foreign_key", "unique"):
            raise ValueError(
                f"{e.kind} expectations are not single-pass observable; "
                "use check_expectations"
            )
    obs = Observation("dq")
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        _violation_expr(e).cast("long").alias(f"viol_{e.name}")
        for e in expectations
    ]
    return df.observe(obs, *aggs), obs


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of ``col`` — the standard distribution-drift gate a corpus
    pipeline runs between snapshots (PSI < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted; the summed index is the consumer's one number, the
    per-bin terms say WHERE it moved).

    Binning is fixed-width from the REFERENCE min/max (two scalar
    aggregates collected driver-side — the bin edges must come from the
    reference alone so drift moves mass, not edges); assignment is plain
    arithmetic ``least(greatest(floor((v-min)/w), 0), bins-1) + 1`` —
    engine-portable on purpose (no width_bucket dialect drift), with
    out-of-range current values clamped into the edge bins. One
    aggregation per side on the bin key (map-side combined), a full outer
    join over ≤ ``bins`` rows, ε-smoothed log ratio. Returns one row per
    occupied bin: (bin, ref_frac, cur_frac, psi_term), fractions and
    terms rounded to 6."""
    stats = ref.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    if stats["lo"] is None:
        raise ValueError("psi_drift requires a non-empty, non-null reference sample")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    w = max((hi - lo) / bins, 1e-12)

    def binned(df: DataFrame, name: str) -> DataFrame:
        df = df.filter(F.col(col).isNotNull())  # NULLs carry no bin
        b = (
            F.least(
                F.greatest(
                    F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(w)),
                    F.lit(0),
                ),
                F.lit(bins - 1),
            )
            + 1
        ).cast("long")
        out = df.select(b.alias("bin")).groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
        total = F.sum("n").over(Window.partitionBy())
        return out.select("bin", (F.col("n") / total).alias(name))

    r = binned(ref, "ref_frac")
    c = binned(cur, "cur_frac")
    j = r.join(c, "bin", "full_outer").select(
        "bin",
        F.coalesce("ref_frac", F.lit(0.0)).alias("ref_frac"),
        F.coalesce("cur_frac", F.lit(0.0)).alias("cur_frac"),
    )
    term = (F.col("cur_frac") - F.col("ref_frac")) * F.log(
        (F.col("cur_frac") + F.lit(eps)) / (F.col("ref_frac") + F.lit(eps))
    )
    return j.select(
        "bin",
        F.round("ref_frac", 6).alias("ref_frac"),
        F.round("cur_frac", 6).alias("cur_frac"),
        F.round(term, 6).alias("psi_term"),
    )


def psi_finalize(
    bin_counts: DataFrame,
    ref_fracs: DataFrame,
    group_cols: list[str],
    eps: float = 1e-6,
) -> DataFrame:
    """Turn per-group bin COUNTS (e.g. the output of
    ``streaming.windowed_drift_bins``, one row per (group, bin)) into
    per-group PSI terms against reference fractions: group totals via a
    window over the AGGREGATED frame (bounded: groups × bins rows, never
    the corpus), reference joined broadcast on bin. Emits only observed
    (group, bin) rows — a current sample is a subset of the reference's
    support when the edges came from the reference, so ``ref_frac`` is
    always matched. Returns group_cols + (bin, ref_frac, cur_frac,
    psi_term), rounded to 6."""
    total = F.sum("n").over(Window.partitionBy(*group_cols))
    cur = bin_counts.withColumn("cur_frac", F.col("n") / total)
    j = cur.join(F.broadcast(ref_fracs), "bin")
    term = (F.col("cur_frac") - F.col("ref_frac")) * F.log(
        (F.col("cur_frac") + F.lit(eps)) / (F.col("ref_frac") + F.lit(eps))
    )
    return j.select(
        *group_cols,
        "bin",
        F.round("ref_frac", 6).alias("ref_frac"),
        F.round("cur_frac", 6).alias("cur_frac"),
        F.round(term, 6).alias("psi_term"),
    )

"""Incremental aggregate maintenance: mergeable partial rollups.

At 100 TB you cannot re-scan the lake because one hourly partition landed.
The standard fix is to keep the rollup in a MERGEABLE form — every kept
statistic must be combinable from partials (count/sum/min/max are; avg and
stddev are derived at read time from sum/count/sum-of-squares) — so
maintenance cost is O(new data + |affected groups|), independent of history
size.

``rollup_partial`` produces the mergeable state for a batch;
``merge_rollups`` combines any number of states associatively (so partials
can themselves be pre-merged per partition, day, region...). The algebraic
identity merge(partial(A), partial(B)) == partial(A ∪ B) is what
tests/test_incremental.py pins, including sum-of-squares-derived variance.

Sums accumulate in DECIMAL so the merge is order-independent — the merged
result is bit-identical to the full recompute, not merely close.

The reference recomputes every feature version from the FULL raw table on
each request (reference compute.py:57-88); this module is the scale
replacement for that pattern.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(28,8)"

_STATE_COLS = ("cnt", "sum_v", "sum_sq", "min_v", "max_v")


def rollup_partial(
    df: DataFrame,
    keys: list[str],
    value: str,
    distinct_col: str | None = None,
    with_quantiles: bool = False,
) -> DataFrame:
    """Mergeable per-group state for ``value``: (cnt, sum, sum-of-squares,
    min, max). One map-side-combinable aggregation.

    ``distinct_col`` additionally keeps a Datasketches HLL sketch of that
    column (binary ``hll``) — COUNT(DISTINCT) is not mergeable, but its
    sketch is: unioning partial sketches carries the same relative-error
    guarantee as sketching the union directly (the estimates can differ by
    a few counts because union promotes the sketch's internal mode, but
    both sit inside the configured rsd). This is how a 100 TB rollup keeps
    an incrementally-maintainable distinct count without ever rescanning
    history.

    ``with_quantiles`` keeps a Datasketches KLL sketch of ``value``
    (binary ``kll``) — quantiles don't combine from sums either, but the
    KLL sketch merges with a published rank-error guarantee, JVM-side.
    This is the built-in production path; the pure-python
    :func:`quantile_digest_partial` family remains for its provably-
    exact uncompressed mode and engine-portable state."""
    v = F.col(value).cast(DEC)
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v).alias("sum_v"),
        F.sum(v * v).alias("sum_sq"),
        F.min(F.col(value)).alias("min_v"),
        F.max(F.col(value)).alias("max_v"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("hll"))
    if with_quantiles:
        aggs.append(
            F.kll_sketch_agg_double(F.col(value).cast("double")).alias("kll")
        )
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(keys: list[str], *states: DataFrame) -> DataFrame:
    """Associatively combine mergeable states (each from
    :func:`rollup_partial` or a previous merge). Groups appearing in only
    some states pass through; shared groups combine exactly."""
    if not states:
        raise ValueError("need at least one state")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.sum("sum_sq").alias("sum_sq"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    ]
    if "hll" in unioned.columns:
        aggs.append(F.hll_union_agg("hll").alias("hll"))
    if "kll" in unioned.columns:
        aggs.append(F.kll_merge_agg_double("kll").alias("kll"))
    return unioned.groupBy(*keys).agg(*aggs)


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changeset to a snapshot: MERGE semantics without Delta.

    ``changes`` carries the base schema plus ``op_col`` ∈ {'I','U','D'}
    (insert / update / delete) with AT MOST ONE change per key — the caller
    collapses multi-change streams to last-write-wins first (e.g. the
    q_scd2_compact latest-per-key pattern). Result =

    * base rows whose key has no change (anti join), plus
    * the new images of inserts and updates (deletes drop out).

    Spark-first shape: this is deliberately NOT a full outer join. The
    anti join + union needs ONE shuffle of base on the key (or zero when
    the changeset is small enough for AQE to broadcast the anti-join side
    — the common nightly-merge case), and the union side is map-only.
    Matches Delta's MERGE INTO result table (store/offline.py documents
    Delta as the production drop-in for the transactional commit itself).

    Reference parity: the reference recomputes feature versions from the
    full raw table per request (reference compute.py:57-88) and appends
    single rows (main.py's POST handlers); an upsert path exists only
    implicitly via SQLite REPLACE semantics. This operator is the batch
    generalization.
    """
    # lazy, distributed validation: assert_true fails the job on the first
    # bad op code — no extra driver-side scan of the changeset per call
    checked = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin("I", "U", "D"), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(F.lit("merge_changes: unknown op: "), F.col(op_col))
            )
        ),
    )
    survivors = base.join(checked.select(*keys), on=keys, how="left_anti")
    upserts = checked.filter(F.col(op_col) != "D").drop(op_col)
    return survivors.unionByName(upserts)


def finalize_rollup(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the user-facing statistics (mean, population variance,
    min/max, count) from the mergeable state at read time."""
    mean = F.col("sum_v").cast("double") / F.col("cnt").cast("double")
    var = (
        F.col("sum_sq").cast("double") / F.col("cnt").cast("double")
    ) - mean * mean
    cols = [
        *keys,
        F.col("cnt"),
        F.round(mean, 6).alias("mean_v"),
        F.round(F.greatest(var, F.lit(0.0)), 6).alias("var_v"),
        F.col("min_v"),
        F.col("max_v"),
    ]
    if "hll" in state.columns:
        cols.append(F.hll_sketch_estimate("hll").alias("approx_distinct"))
    if "kll" in state.columns:
        for q, n in ((0.5, "approx_p50"), (0.95, "approx_p95")):
            cols.append(
                F.kll_sketch_get_quantile_double("kll", F.lit(q)).alias(n)
            )
    return state.select(*cols)


# ---------------------------------------------------------------------------
# mergeable quantile digests
# ---------------------------------------------------------------------------

_DIGEST_FIELDS = "means array<double>, weights array<long>"


def _compress(means, weights, k: int):
    """Recompress a MEAN-SORTED weighted centroid list into <= k equal-
    cumulative-weight chunks (weighted means preserved per chunk). The
    deterministic core of the digest: rank error per (re)compression is
    bounded by total_weight / k."""
    import numpy as np

    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.int64)
    if len(means) <= k:
        return means, weights
    total = int(weights.sum())
    bounds = np.linspace(0, total, k + 1)  # cumulative-weight chunk edges
    cum = np.cumsum(weights)
    # chunk of centroid i = which bound interval its cumulative END falls in
    idx = np.minimum(np.searchsorted(bounds, cum, side="left"), k) - 1
    idx = np.maximum(idx, 0)
    out_m = np.zeros(k)
    out_w = np.zeros(k, dtype=np.int64)
    np.add.at(out_w, idx, weights)
    np.add.at(out_m, idx, means * weights)
    nz = out_w > 0
    return out_m[nz] / out_w[nz], out_w[nz]


def quantile_digest_partial(
    df: DataFrame, keys: list[str], value: str, k: int = 128
) -> DataFrame:
    """Mergeable QUANTILE state — the one statistic the algebraic rollup
    can't carry (quantiles don't combine from sums): per group, a
    weighted centroid summary (``means``/``weights`` arrays, ≤ ``k``
    entries) built by sorting each Arrow batch's values and chunking
    into equal-count runs — the equi-weight simplification of a
    t-digest (uniform rank error ≤ W/k per compression instead of
    t-digest's tail-tightened bound; same merge algebra).

    Scale shape: digests are built PER BATCH inside ``mapInPandas`` —
    raw values never shuffle; what reaches :func:`merge_quantile_digests`
    is ≤ batches × k centroids per group. Multiple rows per (group) come
    back — this is the PARTIAL state, exactly like the map side of a
    combiner; merging is where groups collapse to one row. Estimates are
    approximate (rank error compounds one W/k term per merge LEVEL, not
    per merge — pinned in tests); the exact analogue for one-shot use is
    ``percentile_approx``/DuckDB ``quantile_cont``."""
    import pandas as pd

    key_struct = df.select(*keys, F.col(value).cast("double").alias("__v"))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.select(*keys).schema.fields
    )
    kk = int(k)

    def build(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            for gkey, grp in pdf.groupby(keys, dropna=False, sort=True):
                v = np.sort(grp["__v"].dropna().to_numpy())
                if len(v) == 0:
                    continue
                m, w = _compress(v, np.ones(len(v), dtype=np.int64), kk)
                row = dict(zip(keys, gkey if isinstance(gkey, tuple) else (gkey,)))
                row["means"] = list(m)
                row["weights"] = [int(x) for x in w]
                yield pd.DataFrame([row])

    return key_struct.mapInPandas(build, schema=f"{out_schema}, {_DIGEST_FIELDS}")


def merge_quantile_digests(
    keys: list[str], *states: DataFrame, k: int = 128
) -> DataFrame:
    """Combine digest states: per group, centroids from all partials are
    merged in mean order and recompressed to ≤ ``k`` — the shuffle
    carries centroids only (≤ partials × k rows per group, never raw
    values). Output: ONE digest row per group. APPROXIMATELY associative
    (unlike :func:`merge_rollups`' exact algebra): nesting merges
    compresses intermediate states, shifting estimates by ≤ one W/k
    rank-error term per extra level — pinned in tests."""
    import pandas as pd

    if not states:
        raise ValueError("need at least one state")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    kk = int(k)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in unioned.schema.fields
        if f.name in keys
    )

    def merge(gkey, pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        m = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["weights"]])
        order = np.argsort(m, kind="stable")
        mm, ww = _compress(m[order], w[order], kk)
        row = dict(zip(keys, gkey))
        row["means"] = list(mm)
        row["weights"] = [int(x) for x in ww]
        return pd.DataFrame([row])

    return unioned.groupBy(*keys).applyInPandas(
        merge, schema=f"{out_schema}, {_DIGEST_FIELDS}"
    )


def quantile_from_digest(
    state: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """Read quantile estimates off a digest: cumulative-weight midpoint
    interpolation over the centroid list (the standard digest read). One
    map pass over the ≤ |groups| digest rows."""
    import pandas as pd

    names = [f"q_{str(q).replace('.', '_')}" for q in qs]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in state.schema.fields
        if f.name in keys
    ) + ", " + ", ".join(f"`{n}` double" for n in names)
    qv = [float(q) for q in qs]

    def read(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for _, r in pdf.iterrows():
                m = np.asarray(r["means"], dtype=np.float64)
                w = np.asarray(r["weights"], dtype=np.float64)
                total = w.sum()
                # centroid midpoints in cumulative-rank space
                mid = (np.cumsum(w) - w / 2.0) / total
                row = {kcol: r[kcol] for kcol in keys}
                for q, n in zip(qv, names):
                    row[n] = float(np.interp(q, mid, m))
                out.append(row)
            yield pd.DataFrame(out)

    return state.mapInPandas(read, schema=out_schema)

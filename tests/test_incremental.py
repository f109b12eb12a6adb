"""The mergeable-rollup algebra: merge of per-batch partials must equal the
full recompute BIT-FOR-BIT (decimal accumulation ⇒ order independence)."""

from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.incremental import (
    finalize_rollup,
    merge_rollups,
    rollup_partial,
)
from feature_store_implementation_spark.sources.tables import load_table

KEYS = ["l_returnflag", "l_linestatus"]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_of_partials_equals_full_recompute(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    full = rollup_partial(li, KEYS, "l_extendedprice")
    # split into three "arriving partitions" by an arbitrary hash
    parts = [
        li.filter(F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(3)) == i)
        for i in range(3)
    ]
    merged = merge_rollups(KEYS, *[rollup_partial(p, KEYS, "l_extendedprice") for p in parts])
    assert _canon(merged) == _canon(full)
    # finalize derives identical stats from either state
    assert _canon(finalize_rollup(merged, KEYS)) == _canon(finalize_rollup(full, KEYS))


def test_merge_is_associative_and_handles_disjoint_groups(spark):
    a = spark.createDataFrame(
        [("x", 1.0), ("x", 3.0), ("y", 10.0)], "k string, v double"
    )
    b = spark.createDataFrame([("y", 20.0), ("z", 5.0)], "k string, v double")
    c = spark.createDataFrame([("z", 7.0), ("x", 2.0)], "k string, v double")
    pa, pb, pc = (rollup_partial(d, ["k"], "v") for d in (a, b, c))
    left = merge_rollups(["k"], merge_rollups(["k"], pa, pb), pc)
    right = merge_rollups(["k"], pa, merge_rollups(["k"], pb, pc))
    assert _canon(left) == _canon(right)
    stats = {r["k"]: r for r in finalize_rollup(left, ["k"]).collect()}
    assert stats["x"]["cnt"] == 3 and stats["x"]["mean_v"] == 2.0
    assert stats["y"]["min_v"] == 10.0 and stats["y"]["max_v"] == 20.0
    assert stats["z"]["cnt"] == 2
    # population variance of (1,2,3) is 2/3
    assert abs(stats["x"]["var_v"] - 2.0 / 3.0) < 1e-6


def test_hll_state_merge_equals_full_recompute(spark):
    """Merged partial sketches carry the same error guarantee as the full
    recompute: both estimates must sit within HLL tolerance of the exact
    distinct count (they may differ from each other by a few counts —
    union promotes the sketch's internal representation)."""
    from feature_store_implementation_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        rollup_partial,
    )
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 997).cast("double").alias("v"),
        (F.col("id") % 700).alias("u"),
    )
    a, b = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    merged = merge_rollups(
        ["g"],
        rollup_partial(a, ["g"], "v", distinct_col="u"),
        rollup_partial(b, ["g"], "v", distinct_col="u"),
    )
    full = rollup_partial(df, ["g"], "v", distinct_col="u")
    got = {
        r["g"]: r["approx_distinct"]
        for r in finalize_rollup(merged, ["g"]).collect()
    }
    want = {
        r["g"]: r["approx_distinct"]
        for r in finalize_rollup(full, ["g"]).collect()
    }
    exact = {
        r["g"]: r["x"]
        for r in df.groupBy("g").agg(F.countDistinct("u").alias("x")).collect()
    }
    for g in exact:
        assert abs(got[g] - exact[g]) <= max(0.05 * exact[g], 2)
        assert abs(want[g] - exact[g]) <= max(0.05 * exact[g], 2)


def test_merge_changes_cdc_semantics(spark):
    """MERGE without Delta: inserts append, updates replace, deletes drop,
    untouched keys pass through; unknown op codes fail the job."""
    import pytest as _pytest

    from feature_store_implementation_spark.operators.incremental import merge_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")], "id long, v string, op string"
    )
    got = {r["id"]: r["v"] for r in merge_changes(base, changes, ["id"]).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}  # 3 deleted, 2 updated, 4 inserted
    bad = spark.createDataFrame([(1, "x", "Z")], "id long, v string, op string")
    with _pytest.raises(Exception, match="unknown op"):
        merge_changes(base, bad, ["id"]).collect()


# ---------------------------------------------------------------------------
# mergeable quantile digests
# ---------------------------------------------------------------------------


def _digest_parts(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    return li, a, b


def test_quantile_digest_rank_error_within_bound(spark):
    """Two daily partials merged vs exact quantiles of the union: every
    estimate must land within the documented rank-error bound (~2/k per
    level; measured 0.0006 at k=128 — pin the loose 2/k)."""
    import bisect

    from pyspark.sql import functions as F

    from feature_store_implementation_spark.operators.incremental import (
        merge_quantile_digests,
        quantile_digest_partial,
        quantile_from_digest,
    )

    li, a, b = _digest_parts(spark)
    merged = merge_quantile_digests(
        ["l_returnflag"],
        quantile_digest_partial(a, ["l_returnflag"], "l_extendedprice"),
        quantile_digest_partial(b, ["l_returnflag"], "l_extendedprice"),
    )
    est = quantile_from_digest(merged, ["l_returnflag"], [0.1, 0.5, 0.9]).collect()
    assert len(est) == 3  # one row per group after merge
    for r in est:
        sub = sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == r["l_returnflag"])
            .select("l_extendedprice")
            .collect()
        )
        for q, name in ((0.1, "q_0_1"), (0.5, "q_0_5"), (0.9, "q_0_9")):
            rank = bisect.bisect_left(sub, r[name]) / len(sub)
            assert abs(rank - q) <= 2 / 128, (r["l_returnflag"], name, rank)


def test_quantile_digest_exact_when_uncompressed(spark):
    """k >= group size: no compression ever happens, so partial -> merge
    -> read is EXACTLY midpoint interpolation over the sorted values —
    the provable regime the oracle query runs in."""
    import numpy as np

    from feature_store_implementation_spark.operators.incremental import (
        merge_quantile_digests,
        quantile_digest_partial,
        quantile_from_digest,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    part = quantile_digest_partial(d, ["lang"], "n_chars", k=4096)
    merged = merge_quantile_digests(["lang"], part, k=4096)
    est = {
        r["lang"]: r
        for r in quantile_from_digest(merged, ["lang"], [0.25, 0.75]).collect()
    }
    rows = d.select("lang", "n_chars").collect()
    by = {}
    for r in rows:
        by.setdefault(r["lang"], []).append(float(r["n_chars"]))
    for lang, vals in by.items():
        v = np.sort(np.asarray(vals))
        mid = (np.arange(len(v)) + 0.5) / len(v)
        assert est[lang]["q_0_25"] == float(np.interp(0.25, mid, v))
        assert est[lang]["q_0_75"] == float(np.interp(0.75, mid, v))


def test_quantile_digest_nested_merge_stays_in_bound(spark):
    """Digest merges are APPROXIMATELY associative — pre-merging one side
    compresses it first, so nested and flat merges differ in centroids
    but every estimate must stay within one extra level's rank-error term
    (2 levels ⇒ ≤ 4/k). Empty states raise."""
    import bisect

    import pytest as _pytest
    from pyspark.sql import functions as F

    from feature_store_implementation_spark.operators.incremental import (
        merge_quantile_digests,
        quantile_digest_partial,
        quantile_from_digest,
    )

    li, a, b = _digest_parts(spark)
    pa = quantile_digest_partial(a, ["l_returnflag"], "l_extendedprice")
    pb = quantile_digest_partial(b, ["l_returnflag"], "l_extendedprice")
    nested = merge_quantile_digests(
        ["l_returnflag"], merge_quantile_digests(["l_returnflag"], pa), pb
    )
    est = quantile_from_digest(nested, ["l_returnflag"], [0.5]).collect()
    assert len(est) == 3
    for r in est:
        sub = sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == r["l_returnflag"])
            .select("l_extendedprice")
            .collect()
        )
        rank = bisect.bisect_left(sub, r["q_0_5"]) / len(sub)
        assert abs(rank - 0.5) <= 4 / 128
    with _pytest.raises(ValueError, match="at least one"):
        merge_quantile_digests(["x"])


def test_kll_rollup_merge_quantile_error(spark):
    """Built-in KLL path: partials from two halves merged, p50/p95 read
    off in finalize — estimates within 2% relative of exact."""
    from pyspark.sql import functions as F

    from feature_store_implementation_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        rollup_partial,
    )

    li, a, b = _digest_parts(spark)
    m = merge_rollups(
        ["l_returnflag"],
        rollup_partial(a, ["l_returnflag"], "l_extendedprice", with_quantiles=True),
        rollup_partial(b, ["l_returnflag"], "l_extendedprice", with_quantiles=True),
    )
    out = {r["l_returnflag"]: r for r in finalize_rollup(m, ["l_returnflag"]).collect()}
    exact = {
        r["l_returnflag"]: r["p"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("p"))
        .collect()
    }
    for k_, (p50, p95) in exact.items():
        assert abs(out[k_]["approx_p50"] - p50) / p50 < 0.02
        assert abs(out[k_]["approx_p95"] - p95) / p95 < 0.02

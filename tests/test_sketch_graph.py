"""Exactness tests for the round-2 distributed algorithms: Misra-Gries
heavy hitters (operators/sketch.py) and fixed-point PageRank
(operators/graph.py) against pure-Python oracles."""

from collections import Counter, defaultdict

from feature_store_implementation_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixed_point,
)
from feature_store_implementation_spark.operators.sketch import frequent_items


def _hh_oracle(values, k):
    n = len(values)
    return {v: c for v, c in Counter(values).items() if c > n / k}


def _check_hh(spark, values, k, parts=7):
    df = spark.createDataFrame([(v,) for v in values], "item string").repartition(parts)
    got = {r["item"]: r["cnt"] for r in frequent_items(df, "item", k).collect()}
    assert got == _hh_oracle(values, k)


def test_heavy_hitters_skewed_exact(spark):
    # zipf-ish: item i appears ~1000/i times — clear hitters plus a long tail
    values = [f"v{i}" for i in range(1, 60) for _ in range(1000 // i)]
    _check_hh(spark, values, k=20)


def test_heavy_hitters_adversarial_near_threshold(spark):
    # many items sitting JUST below the n/k threshold try to crowd the MG
    # counters; the exact recount must still drop every one of them
    values = []
    for i in range(50):
        values += [f"low{i}"] * 9  # below threshold
    values += ["big0"] * 120 + ["big1"] * 80
    k = len(values) // 10  # threshold = 10
    _check_hh(spark, values, k=k)


def test_heavy_hitters_no_qualifiers(spark):
    # uniform data with a tight threshold: nothing qualifies, output empty
    values = [f"u{i % 40}" for i in range(400)]  # every count == 10
    _check_hh(spark, values, k=30)  # threshold 13.3 > 10


def _py_pagerank(edge_set, iterations):
    deg = Counter(s for s, _ in edge_set)
    nodes = sorted(deg)
    n = len(nodes)
    base = PR_SCALE * 15 // (100 * n)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iterations):
        mass = defaultdict(int)
        for s, d in edge_set:
            mass[d] += (r[s] * 85) // (100 * deg[s])
        r = {v: base + mass.get(v, 0) for v in nodes}
    return r


def test_pagerank_matches_python_oracle(spark):
    # a lopsided symmetric graph: hub 0 touches everyone, plus a chain
    pairs = [(0, i) for i in range(1, 12)] + [(i, i + 1) for i in range(1, 11)]
    edge_set = set(pairs) | {(b, a) for a, b in pairs}
    df = spark.createDataFrame(sorted(edge_set), "src long, dst long").repartition(5)
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(df, iterations=6).collect()
    }
    assert got == _py_pagerank(edge_set, 6)


def test_pagerank_mass_is_conserved_up_to_floor_loss(spark):
    # floor division only ever LOSES fixed-point mass; total rank must stay
    # within N*(100+iters) ulps below 1.0 and the hub must dominate
    pairs = [(0, i) for i in range(1, 12)] + [(i, i + 1) for i in range(1, 11)]
    edge_set = set(pairs) | {(b, a) for a, b in pairs}
    df = spark.createDataFrame(sorted(edge_set), "src long, dst long")
    rows = pagerank_fixed_point(df, iterations=6).collect()
    total = sum(r["rank_fp"] for r in rows)
    assert PR_SCALE - len(rows) * 1000 < total <= PR_SCALE
    top = max(rows, key=lambda r: r["rank_fp"])
    assert top["node"] == 0


def test_pagerank_symmetric_fast_path_identical(spark):
    pairs = [(0, i) for i in range(1, 9)] + [(3, 7), (4, 8)]
    edge_set = set(pairs) | {(b, a) for a, b in pairs}
    df = spark.createDataFrame(sorted(edge_set), "src long, dst long")
    slow = {
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(df, iterations=5).collect()
    }
    fast = {
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(
            df, iterations=5, assume_distinct=True, assume_symmetric=True
        ).collect()
    }
    assert fast == slow


def test_empty_and_degenerate_inputs(spark):
    from feature_store_implementation_spark.operators.sketch import frequent_items

    empty = spark.createDataFrame([], "item string")
    assert frequent_items(empty, "item", 5).count() == 0
    single = spark.createDataFrame([("x",)], "item string")
    got = {r["item"]: r["cnt"] for r in frequent_items(single, "item", 5).collect()}
    assert got == {"x": 1}


def test_frequent_items_null_group_matches_group_by(spark):
    # SQL GROUP BY keeps a NULL group; frequent_items must emit (NULL, cnt)
    # when NULL keys clear the n/k threshold, and omit it when they don't
    from feature_store_implementation_spark.operators.sketch import frequent_items

    rows = [("a",)] * 40 + [(None,)] * 30 + [("b",)] * 20 + [("c",)] * 10
    df = spark.createDataFrame(rows, "item string").repartition(7)
    got = {r["item"]: r["cnt"] for r in frequent_items(df, "item", 4).collect()}
    assert got == {"a": 40, None: 30}  # threshold 100/4 = 25
    # below threshold: NULL group must NOT appear
    got2 = {r["item"]: r["cnt"] for r in frequent_items(df, "item", 2).collect()}
    assert got2 == {}


def test_pagerank_empty_graph(spark):
    from feature_store_implementation_spark.operators.graph import pagerank_fixed_point

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank_fixed_point(empty, iterations=3).collect() == []


def test_pagerank_checkpoint_interval_is_semantics_free(spark):
    from feature_store_implementation_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)], "src long, dst long"
    )
    every = {
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(edges, iterations=4).collect()
    }
    batched = {
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(
            edges, iterations=4, checkpoint_interval=4
        ).collect()
    }
    assert every == batched


def test_zvalue_rejects_key_overflow(spark):
    import pytest

    from pyspark.sql import functions as F

    from feature_store_implementation_spark.operators.layout import zvalue

    ranks = [F.lit(1).cast("long")] * 6
    with pytest.raises(ValueError, match="> 63"):
        zvalue(ranks, 12)  # 6 * 12 = 72 bits would wrap mod 64
    zvalue(ranks, 10)  # 60 bits fits


def test_theta_overlap_exact_below_nominal(spark):
    """Theta set-operation estimates are EXACT below the sketch's nominal
    4,096 entries — keyed and global forms both match python sets on the
    sf0.01 partkeys (~2,000 distinct per side)."""
    from pyspark.sql import functions as F

    from feature_store_implementation_spark.operators.sketch import theta_overlap

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    got = {
        r["l_returnflag"]: r
        for r in theta_overlap(a, b, "l_partkey", keys=["l_returnflag"]).collect()
    }
    for flag in got:
        ia = {
            r["l_partkey"]
            for r in a.filter(F.col("l_returnflag") == flag)
            .select("l_partkey")
            .distinct()
            .collect()
        }
        ib = {
            r["l_partkey"]
            for r in b.filter(F.col("l_returnflag") == flag)
            .select("l_partkey")
            .distinct()
            .collect()
        }
        r = got[flag]
        assert (r["n_a"], r["n_b"]) == (len(ia), len(ib))
        assert r["n_intersection"] == len(ia & ib)
        assert r["n_union"] == len(ia | ib)
        assert r["n_only_a"] == len(ia - ib)
    g = theta_overlap(a, b, "l_partkey").collect()[0]
    ia = {r["l_partkey"] for r in a.select("l_partkey").distinct().collect()}
    ib = {r["l_partkey"] for r in b.select("l_partkey").distinct().collect()}
    assert g["n_union"] == len(ia | ib) and g["n_intersection"] == len(ia & ib)

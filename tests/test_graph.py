"""Connected components: chain diameter, isolated vertices, determinism."""

from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.graph import connected_components


def _components(spark, edges, vertices=None):
    edf = spark.createDataFrame(edges, "src string, dst string")
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], "node string")
        if vertices is not None
        else None
    )
    out = connected_components(edf, vertices=vdf).collect()
    return {r["node"]: r["component"] for r in out}

def test_two_clusters_and_chain(spark):
    # a-b-c-d chain (diameter 3) plus x-y pair
    got = _components(spark, [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_isolated_vertices_keep_themselves(spark):
    got = _components(spark, [("a", "b")], vertices=["a", "b", "z"])
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_long_chain_converges(spark):
    nodes = [f"n{i:02d}" for i in range(12)]
    edges = list(zip(nodes, nodes[1:]))
    got = _components(spark, edges)
    assert set(got.values()) == {"n00"}


def test_matches_python_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = [f"v{i}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for n in nodes:
        root = find(n)
        expected[n] = min(m for m in nodes if find(m) == root)

    got = _components(spark, edges, vertices=nodes)
    assert got == expected

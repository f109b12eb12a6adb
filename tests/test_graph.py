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


def test_bfs_hops_path_graph(spark):
    from feature_store_implementation_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5 plus isolated component 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, sources, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond radius; 10/11 unreachable
    # multi-source: min distance wins, early termination on empty frontier
    sources2 = spark.createDataFrame([(1,), (5,)], "node long")
    out2 = {r["node"]: r["hops"] for r in bfs_hops(edges, sources2, max_hops=4).collect()}
    assert out2 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_triangle_count_max_degree_caps_only_wedge_middles(spark):
    """ADVICE r6 pin for the capped-path contract: wedges through a
    super-node MIDDLE are skipped, but triangles whose middle is low-degree
    survive even when an endpoint is the super-node (closure edges stay
    complete), and max_degree=None stays exact."""
    from feature_store_implementation_spark.operators.graph import triangle_count

    edges = [(1, 2), (2, 3), (1, 3)]            # triangle A: all low degree
    edges += [(5, x) for x in range(100, 141)]  # hub 5: degree 41+
    edges += [(1, 5), (9, 5), (1, 9)]           # triangle B: middle IS the hub
    edges += [(5, 200), (200, 201), (5, 201)]   # triangle C: hub endpoint, middle 200
    df = spark.createDataFrame(edges, "src long, dst long")

    assert triangle_count(df).collect()[0]["n_triangles"] == 3
    capped = triangle_count(df, max_degree=10).collect()[0]["n_triangles"]
    assert capped == 2  # B is the documented miss; A and C survive


def test_driver_and_bsp_components_identical(spark):
    """The adaptive driver-side union-find must label exactly like the
    distributed min-label BSP on arbitrary graphs (chains, stars,
    cycles, isolated vertices, both orientations)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(80)]
    edges += [(100, 101), (101, 102), (102, 103)]  # a chain
    edf = spark.createDataFrame(edges, "src long, dst long")
    vdf = spark.createDataFrame([(i,) for i in range(0, 120, 7)], "node long")

    fast = connected_components(edf, vertices=vdf)
    slow = connected_components(edf, vertices=vdf, driver_max_edges=0)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
    # and the fast path really is the default for a set this small
    assert fast.count() == slow.count()

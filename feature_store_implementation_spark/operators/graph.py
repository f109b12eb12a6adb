"""Connected components over an edge list — the clustering step that turns
pairwise duplicate candidates (MinHash / SimHash / blocked-Levenshtein pairs,
``operators/dedup.py``) into dedup groups, so one canonical document per
component survives.

The reference has no graph surface at all; its dedup story stops at the
pandas sandbox (reference compute.py:30-55). At 100 TB the pair graph itself
is distributed, so we use iterative min-label propagation expressed as plain
DataFrame joins:

* each node starts labeled with itself;
* every iteration, a node's label becomes ``min(own, min(neighbor labels))``
  — one shuffle per iteration on the node key;
* converges in O(graph diameter) iterations. Duplicate clusters are
  near-cliques, so the diameter is tiny in practice (2-4 hops).

Scale notes: lineage is truncated every iteration with ``localCheckpoint``
(on a real cluster prefer ``spark.sparkContext.setCheckpointDir`` + eager
``checkpoint`` so a lost executor doesn't replay the whole loop). The
convergence probe is one small count per iteration — acceptable because the
label frame is |V| rows of two columns, far smaller than the data that
produced the pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


PR_SCALE = 1_000_000_000_000  # fixed-point denominator: rank 1.0 == 10^12


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    assume_distinct: bool = False,
    assume_symmetric: bool = False,
    checkpoint_interval: int = 1,
    broadcast_rank_limit: int = 2_000_000,
) -> DataFrame:
    """Deterministic PageRank over a directed edge list, in fixed-point
    integer arithmetic so the result is bit-exact and order-independent.

    Floating-point PageRank is not reproducible across engines (double
    summation is order-dependent), so ranks are kept as BIGINT numerators
    over ``PR_SCALE``: each iteration computes

        rank'(v) = (PR_SCALE * (100-d)) div (100 * N)
                 + sum over in-edges (u,v) of (rank(u) * d) div (100 * deg(u))

    with integer (floor) division — associative, commutative, and identical
    in Spark and DuckDB, which lets a recursive-CTE oracle check the result
    hash-for-hash. Every node must have out-degree >= 1 (symmetrize the edge
    list first); dangling-mass redistribution is deliberately out of scope.

    Scale shape: the edge list (with out-degree attached) is checkpointed
    once and re-joined each iteration — one shuffle per iteration on the
    node key, rank state is |V| rows. That is the standard bulk-synchronous
    PageRank layout; iterations are a fixed count so the job graph is static.

    ``checkpoint_interval`` controls how often the rank frame's lineage is
    truncated: every iteration (1, the safe default for long runs) forces a
    blocking materialization per step; a few-iteration run can set it to the
    iteration count so the chained shuffles compose into fewer jobs and AQE
    plans across them. The final frame is always checkpointed.

    The per-iteration edges⋈ranks join broadcasts the rank frame when
    |V| <= ``broadcast_rank_limit`` (|V| is known exactly by then; AQE
    does not convert this join on its own because the rank side's stats
    are hidden behind the iteration's fresh shuffle) — that removes the
    per-iteration |E| shuffle entirely: edges stay in place, each
    executor gets the ~16-bytes-per-node rank map. Above the limit (a
    billion-node web graph) it degrades to the standard shuffle join on
    the node key, which is the correct layout at that size.

    Returns ``(node, rank_fp)`` — BIGINT fixed-point ranks summing to ~1.0.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        # one dedup shuffle, skippable when the caller built the edge list
        # from a distinct pair set (the common symmetrize-a-distinct case)
        e = e.distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)

    # |V| rows, re-joined every iteration — materialize ONCE (off the
    # checkpointed edge frame) instead of re-aggregating |E| rows per iter
    nodes = ed.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        # empty graph: no nodes, no ranks — avoid the 1/n base-mass division
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fp"))
    base = PR_SCALE * (100 - damping_pct) // (100 * n)
    ranks = nodes.select("node", F.lit(PR_SCALE // n).cast("long").alias("rank_fp"))

    for it in range(iterations):
        materialize = it == iterations - 1 or (it + 1) % checkpoint_interval == 0
        rank_side = ranks.withColumnRenamed("node", "src")
        if n <= broadcast_rank_limit:
            rank_side = F.broadcast(rank_side)
        contrib = (
            ed.join(rank_side, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank_fp * {damping_pct}) div (100 * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        if assume_symmetric:
            # symmetric graph ⇒ every node has an in-edge ⇒ contrib already
            # covers the node set: skip the per-iteration nodes join
            ranks = contrib.select(
                "node",
                (F.lit(base) + F.col("in_mass")).cast("long").alias("rank_fp"),
            )
        else:
            # general graphs: keep nodes with no in-edges via left join
            ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit(base) + F.coalesce("in_mass", F.lit(0)))
                .cast("long")
                .alias("rank_fp"),
            )
        if materialize:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    max_iter: int = 25,
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """Label each vertex with the minimum vertex id reachable from it.

    ``edges`` is an undirected pair list (each row one edge, either
    orientation). ``vertices`` (one column ``node``) optionally adds isolated
    nodes, which keep themselves as their component. Returns ``(node,
    component)`` with one row per vertex.

    Adaptive execution (the broadcast-join idea applied to BSP): the
    symmetrized edge set is counted once on its checkpoint, and at or
    under ``driver_max_edges`` rows the components are solved EXACTLY by
    a driver-side union-find — ~2 jobs total instead of ~3 per BSP
    iteration. Near-dup graphs after a good dedup gate are exactly this
    shape (a few percent of the corpus in 2-3-node clusters), and a
    1000-executor cluster should not run a 10-round label-propagation
    fixpoint to label 50k edges. Larger graphs take the distributed
    min-label BSP path unchanged; both paths return identical labels
    (min id per component — pinned equal on random graphs in
    tests/test_graph.py). ``driver_max_edges=0`` forces the BSP path."""
    # materialize the symmetrized edge set once — it is re-joined every
    # iteration and must not be recomputed from the (possibly expensive)
    # upstream pair-generation plan each time
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    if driver_max_edges and und.count() <= driver_max_edges:
        return _driver_components(und, vertices)

    nodes = und.select(F.col("a").alias("node")).distinct()
    if vertices is not None:
        nodes = nodes.union(vertices.select(F.col(vertices.columns[0]).alias("node"))).distinct()
    labels = nodes.select("node", F.col("node").alias("component"))

    for _ in range(max_iter):
        nbr = (
            und.join(
                labels.select(
                    F.col("node").alias("b"), F.col("component").alias("nbr_comp")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("nbr_comp").alias("nbr_comp"))
        )
        # carry a per-row "did the label shrink" flag through the same join
        # so convergence costs one count on the checkpointed frame, not an
        # extra self-join
        stepped = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_comp", "component")
                ).alias("new_component"),
                (F.coalesce("nbr_comp", "component") < F.col("component")).alias(
                    "shrunk"
                ),
            )
            .localCheckpoint(eager=True)
        )
        labels = stepped.select("node", F.col("new_component").alias("component"))
        if stepped.filter("shrunk").limit(1).count() == 0:
            converged = True
            break
    else:
        converged = False
    if not converged:
        # labels were still shrinking when the budget ran out: returning
        # them silently would hand a long near-dup chain's far ends
        # DIFFERENT component ids, and leakage_safe_split would place
        # near-duplicates of one chain in both train and test — the exact
        # leak its docstring promises cannot happen
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} (a component's diameter exceeds it — min-label "
            "propagation moves one hop per iteration); raise max_iter"
        )
    return labels.localCheckpoint(eager=True)


def _driver_components(und: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """Exact union-find over a COUNTED-small symmetrized edge set; isolated
    ``vertices`` keep themselves distributedly (never collected — the
    vertex frame can be corpus-sized even when the edge set is tiny)."""
    import pyspark.sql.types as T

    pairs = [(r["a"], r["b"]) for r in und.collect()]
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    members = {n for ab in pairs for n in ab}
    for n in members:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    node_type = und.schema["a"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("component", node_type, False),
        ]
    )
    labels = und.sparkSession.createDataFrame(
        [(n, comp_min[find(n)]) for n in sorted(members)], schema
    )
    if vertices is not None:
        vcol = vertices.columns[0]
        isolated = (
            vertices.select(F.col(vcol).alias("node"))
            .distinct()
            .join(labels.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        labels = labels.unionByName(isolated)
    return labels.localCheckpoint(eager=True)


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Count triangles in an undirected graph by the ordered-wedge algorithm:
    canonicalize every edge to ``a < b``, build wedges ``a < b < c`` with one
    self-join on the middle vertex, close them with a second join — each
    triangle is counted exactly once, with hash joins only (no cartesian, no
    factorial blowup). This is the same plan shape as ``q_triangle_count``
    (plans/inventory.py), extracted so the scale sweep can measure its growth
    exponent on synthetic graphs.

    Scale shape: the wedge join fans out as in_deg(b)·out_deg(b) summed
    over wedge middles, so cost is linear in |E| at constant max degree
    but grows with skew. ``max_degree`` is the escape hatch for
    heavy-tailed graphs: wedges whose MIDDLE vertex (the median id of the
    ordered triple) has undirected degree above the cap are skipped —
    applied to the two wedge legs only, so closure edges stay complete
    and the per-middle fan-out is bounded by cap²; triangles routed
    through super-node middles are the documented miss. ``None`` keeps
    the count exact. Returns a single row ``(n_triangles)``.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("pa"),
            F.greatest(F.col(src), F.col(dst)).alias("pb"),
        )
        .filter(F.col("pa") < F.col("pb"))
        .distinct()
    )
    e1 = canon
    e2 = canon.select(F.col("pa").alias("pb"), F.col("pb").alias("pc"))
    if max_degree is not None:
        degs = (
            canon.select(F.col("pa").alias("v"))
            .union(canon.select(F.col("pb").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        ok_mid = degs.filter(F.col("deg") <= max_degree).select(
            F.col("v").alias("pb")
        )
        e1 = e1.join(ok_mid, "pb", "left_semi")
        e2 = e2.join(ok_mid, "pb", "left_semi")
    e3 = canon.select(F.col("pa").alias("pa2"), F.col("pb").alias("pc2"))
    return (
        e1.join(e2, "pb")
        .join(e3, (F.col("pa") == F.col("pa2")) & (F.col("pc") == F.col("pc2")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Minimum hop distance from any source vertex, by BSP frontier
    expansion over the symmetrized edge list: each round joins the current
    frontier to the (checkpointed-once) edge set, anti-joins already-
    settled vertices, and settles the new ring at distance h. Terminates
    early when a frontier empties; every round is one equi-join + one
    anti-join keyed on the vertex — the textbook distributed BFS, no
    driver-side adjacency. Returns ``(node, hops)`` for every vertex
    reachable within ``max_hops`` (sources at 0)."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = sources.select(
        F.col(sources.columns[0]).alias("node"), F.lit(0).cast("long").alias("hops")
    ).distinct().localCheckpoint(eager=True)
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        ring = (
            und.join(frontier.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        if ring.limit(1).count() == 0:
            break
        dist = dist.union(ring).localCheckpoint(eager=True)
        frontier = ring.select("node")
    return dist

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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Label each vertex with the minimum vertex id reachable from it.

    ``edges`` is an undirected pair list (each row one edge, either
    orientation). ``vertices`` (one column ``node``) optionally adds isolated
    nodes, which keep themselves as their component. Returns ``(node,
    component)`` with one row per vertex.
    """
    # materialize the symmetrized edge set once — it is re-joined every
    # iteration and must not be recomputed from the (possibly expensive)
    # upstream pair-generation plan each time
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )

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
            break
    return labels.localCheckpoint(eager=True)

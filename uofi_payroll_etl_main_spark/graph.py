"""Graph analytics over relationship edges (entity-resolution /
duplicate-cluster graphs, supplier-customer networks).

Connected components (duplicate-cluster resolution) lives in
`llm/dedup.py`; this module holds rank-style iterative algorithms.

PageRank here is the standard simplified power iteration: a fixed
number of synchronous iterations, dangling mass not redistributed
(nodes with no out-edges simply leak their damped mass, as in the
original formulation).  Cross-engine determinism: per-edge
contributions are summed as DECIMAL(38,18) -- exact, order-independent
-- then finished in IEEE double, so the oracle (an unrolled recursive
SQL of the same arithmetic) hash-matches bit-for-bit.

Scale notes (billions of edges):
  * Each iteration is one shuffle: edges pre-joined with out-degree
    once (reused across iterations), then ranks join on src (shuffle
    bounded by node count, with AQE handling hub skew) and aggregate
    on dst with map-side combine.
  * Nothing is collected to the driver except the node COUNT (a scalar
    action, once).
  * For many iterations, persist/checkpoint the rank frame between
    steps to cut lineage; at 3 iterations lineage depth is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank) for every node appearing as source or
    destination.  rank_0 = 1/N; rank_{i+1}(v) = (1-d)/N +
    d * sum_{(u,v) in E} rank_i(u) / outdeg(u).
    """
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
        .persist()  # read once per iteration; without it the edge
        # subplan re-expands into every iteration's lineage and the
        # plan recomputes the edge build O(iterations) times
    )
    n = nodes.count()
    deg = e.groupBy("__src").agg(F.count("*").alias("__od"))
    weighted = e.join(deg, "__src").persist()  # reused every iteration
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            weighted.join(ranks, weighted["__src"] == ranks["node"])
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") / F.col("__od")).cast("decimal(38,18)").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * F.coalesce(F.col("__s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks

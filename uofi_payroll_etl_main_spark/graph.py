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
    redistribute_dangling: bool = False,
    tol: float | None = None,
) -> DataFrame:
    """PageRank over a directed edge list.

    Returns (node, rank) for every node appearing as source or
    destination.  rank_0 = 1/N; rank_{i+1}(v) = (1-d)/N +
    d * sum_{(u,v) in E} rank_i(u) / outdeg(u).

    redistribute_dangling=True adds the full formulation's correction:
    mass parked on nodes with no out-edges is spread uniformly
    (d * dangling_mass / N added to every node), so total rank stays 1
    instead of leaking.  The dangling sum is a ONE-ROW aggregate joined
    back by broadcast -- it never leaves the engine, no extra driver
    action.

    tol (epsilon termination): stop before `iterations` when
    max |rank_{i+1} - rank_i| < tol.  Costs one scalar action per
    iteration (the convergence test is inherently a global reduce) and
    persists each iterate so the delta check doesn't recompute the
    chain; iterates are unpersisted as soon as superseded.
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
        new = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * F.coalesce(F.col("__s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
        if redistribute_dangling:
            dangling = (
                ranks.join(deg, ranks["node"] == deg["__src"], "left_anti")
                .agg(F.sum(F.col("rank").cast("decimal(38,18)")).alias("__dm"))
            )
            new = new.crossJoin(F.broadcast(dangling)).select(
                "node",
                (
                    F.col("rank")
                    + F.lit(damping)
                    * F.coalesce(F.col("__dm").cast("double"), F.lit(0.0))
                    / F.lit(float(n))
                ).alias("rank"),
            )
        if tol is not None:
            # localCheckpoint TRUNCATES LINEAGE, not just caches: with
            # plain persist the logical plan still nests one level per
            # iteration and Catalyst analysis OOMs the driver near ~100
            # iterations.  (Production note: prefer reliable
            # checkpoint() on a real cluster -- localCheckpoint dies
            # with an executor.)
            new = new.localCheckpoint(eager=True)
            delta_row = (
                new.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("__delta"))
                .collect()
            )
            ranks = new
            delta = delta_row[0]["__delta"]
            if delta is not None and delta < tol:
                break
        else:
            ranks = new
    return ranks

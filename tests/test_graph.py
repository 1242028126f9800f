"""PageRank: hand-checked fixtures + invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from uofi_payroll_etl_main_spark.graph import pagerank


def test_pagerank_two_node_cycle(spark):
    """a<->b is symmetric: both converge to 0.5 at every iteration."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    assert abs(out["a"] - 0.5) < 1e-12 and abs(out["b"] - 0.5) < 1e-12


def test_pagerank_star_hand_computed(spark):
    """Three leaves pointing at a hub, one iteration:
    hub = (1-d)/4 + d * 3 * (1/4); leaf = (1-d)/4."""
    e = spark.createDataFrame(
        [("l1", "hub"), ("l2", "hub"), ("l3", "hub")], "src string, dst string"
    )
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=1, damping=0.85).collect()}
    base = (1.0 - 0.85) / 4
    assert abs(out["hub"] - (base + 0.85 * 0.75)) < 1e-12
    for leaf in ("l1", "l2", "l3"):
        assert abs(out[leaf] - base) < 1e-12


def test_pagerank_mass_leaks_only_via_dangling(spark):
    """With no dangling nodes total rank mass stays 1; ranks positive."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    rows = pagerank(e, iterations=3).collect()
    assert all(r["rank"] > 0 for r in rows)
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9

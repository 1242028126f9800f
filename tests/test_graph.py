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


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    """a->b->c with c dangling: default leaks c's damped mass, the
    redistribution option conserves total rank = 1 every iteration."""
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    leaky = sum(r["rank"] for r in pagerank(e, iterations=5).collect())
    assert leaky < 1.0 - 1e-6  # documents the simplified formulation
    full = pagerank(e, iterations=5, redistribute_dangling=True).collect()
    assert abs(sum(r["rank"] for r in full) - 1.0) < 1e-9
    assert all(r["rank"] > 0 for r in full)


def test_pagerank_dangling_hand_computed_one_iteration(spark):
    """a->b, b dangling, d=0.5, N=2.  rank_0 = .5 each.
    pre-redistribution: b = (1-d)/2 + d*.5 = .5, a = .25;
    dangling mass (b, rank_0=.5) spreads d*.5/2 = .125 to both."""
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {
        r["node"]: r["rank"]
        for r in pagerank(
            e, iterations=1, damping=0.5, redistribute_dangling=True
        ).collect()
    }
    assert abs(out["a"] - (0.25 + 0.125)) < 1e-12
    assert abs(out["b"] - (0.5 + 0.125)) < 1e-12


def test_pagerank_tol_stops_early_and_matches_long_run(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b")],
        "src string, dst string",
    )
    converged = {
        r["node"]: r["rank"]
        for r in pagerank(e, iterations=100, tol=1e-9).collect()
    }
    long_run = {r["node"]: r["rank"] for r in pagerank(e, iterations=60).collect()}
    for k in long_run:
        assert abs(converged[k] - long_run[k]) < 1e-6

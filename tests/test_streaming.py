"""Structured Streaming: bounded AvailableNow drain of the event stream
into a memory sink must reproduce the batch tumbling aggregation exactly
(shared expressions, so this validates the watermark/trigger plumbing)."""

from __future__ import annotations

import pytest

from tests.conftest import rows
from uofi_payroll_etl_main_spark.io import load_table
from uofi_payroll_etl_main_spark.streaming.streams import (
    read_event_stream,
    run_to_memory,
    streaming_tumbling_counts,
)
from uofi_payroll_etl_main_spark.streaming.windows import tumbling_agg


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    # events.parquet stores TIMESTAMP(NANOS); load_table normalizes to
    # micros -- rewrite so the streaming file source reads a clean schema.
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(path)
    return path


def test_streaming_tumbling_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    run_to_memory(streaming_tumbling_counts(stream, "1 hour"), "t_stream", timeout_s=180)
    got = rows(spark.table("t_stream"))

    batch = tumbling_agg(spark.read.parquet(event_dir), "1 hour")
    expect = rows(batch)
    assert got == expect
    assert len(got) > 0


def test_run_to_memory_timeout_stops_query_and_restores_conf(spark, event_dir):
    """ADVICE r8: a drain that exceeds timeout_s must raise AND stop the
    query -- leaving it running after the shuffle-partitions conf is
    restored would plan later micro-batches under the session-wide
    width the override existed to avoid."""
    import pytest as _pytest

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    stream = read_event_stream(spark, event_dir)
    with _pytest.raises(TimeoutError, match="did not finish"):
        run_to_memory(
            streaming_tumbling_counts(stream, "1 hour"),
            "t_stream_timeout",
            timeout_s=0.001,
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert not any(
        q.name == "t_stream_timeout" for q in spark.streams.active
    ), "timed-out drain left its query running"


def test_streaming_session_matches_batch(spark, event_dir):
    from uofi_payroll_etl_main_spark.streaming.streams import streaming_session_counts
    from uofi_payroll_etl_main_spark.streaming.windows import session_agg

    stream = read_event_stream(spark, event_dir)
    run_to_memory(streaming_session_counts(stream, "30 minutes"), "s_stream", timeout_s=180)
    got = rows(spark.table("s_stream"), "user_id", "n_events", "sum_value")
    expect = rows(session_agg(spark.read.parquet(event_dir), "30 minutes"),
                  "user_id", "n_events", "sum_value")
    assert got == expect and len(got) > 0


def test_streaming_dedup_drops_repeats(spark, event_dir, tmp_path_factory):
    from uofi_payroll_etl_main_spark.streaming.streams import streaming_dedup

    # double every event -> the deduped stream must restore the original count
    src = spark.read.parquet(event_dir)
    doubled_dir = str(tmp_path_factory.mktemp("events_doubled"))
    src.union(src).write.mode("overwrite").parquet(doubled_dir)
    stream = read_event_stream(spark, doubled_dir)
    run_to_memory(streaming_dedup(stream), "d_stream", timeout_s=180, output_mode="append")
    assert spark.table("d_stream").count() == src.count()


def test_streaming_running_totals(spark, event_dir):
    from uofi_payroll_etl_main_spark.streaming.streams import streaming_running_totals

    stream = read_event_stream(spark, event_dir)
    run_to_memory(streaming_running_totals(stream), "r_stream", timeout_s=180,
                  output_mode="update")
    # final state per user == batch aggregate (take the last emitted row per user)
    import pyspark.sql.functions as F

    got = (
        spark.table("r_stream")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    expect = spark.read.parquet(event_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    assert rows(got) == rows(expect)


def test_merge_upsert_keeps_latest(spark, tmp_path):
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.io import merge_upsert

    base = str(tmp_path / "tbl")
    spark.createDataFrame(
        [Row(k="a", v="old-a", ver=1), Row(k="b", v="old-b", ver=1), Row(k="c", v="keep-c", ver=5)]
    ).write.parquet(base)
    updates = spark.createDataFrame(
        [Row(k="a", v="new-a", ver=2),     # newer version wins
         Row(k="c", v="late-c", ver=3),    # older than existing: loses
         Row(k="d", v="insert-d", ver=1)]  # brand-new key
    )
    merged = merge_upsert(spark, base, updates, keys=["k"], order_col="ver")
    got = {r.k: r.v for r in merged.collect()}
    assert got == {"a": "new-a", "b": "old-b", "c": "keep-c", "d": "insert-d"}
    # ties: update wins over existing at equal version
    updates2 = spark.createDataFrame([Row(k="b", v="tie-b", ver=1)])
    merged2 = merge_upsert(spark, base, updates2, keys=["k"], order_col="ver")
    assert {r.k: r.v for r in merged2.collect()}["b"] == "tie-b"


def test_streaming_append_to_parquet_finalizes_closed_windows(spark, event_dir, tmp_path):
    """Append-mode windowed agg -> parquet file sink: only windows the
    watermark has CLOSED are emitted (the classic streaming-sink gotcha:
    windows within the watermark horizon of the max event time never
    finalize on a bounded run)."""
    import pyspark.sql.functions as F

    from uofi_payroll_etl_main_spark.streaming.streams import (
        read_event_stream,
        streaming_tumbling_counts,
    )
    from uofi_payroll_etl_main_spark.streaming.windows import tumbling_agg

    out_dir = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt")
    sdf = streaming_tumbling_counts(read_event_stream(spark, event_dir), "1 hour", "2 hours")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    batch = tumbling_agg(spark.read.parquet(event_dir), "1 hour")
    max_ts = spark.read.parquet(event_dir).agg(F.max("ts")).first()[0]
    # windows ending after (max_ts - 2h watermark) are still open -> absent
    import datetime

    horizon = max_ts - datetime.timedelta(hours=2)
    closed = batch.filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(horizon))
    g = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in got.collect()}
    e = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in closed.collect()}
    assert g == e and len(g) > 0


def test_streaming_upsert_sink_converges_to_batch_merge(spark, tmp_path):
    """readStream -> foreachBatch merge_upsert lands the same state a
    single batch keep-latest would: latest value per user wins across
    sequentially-applied micro-batches."""
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.streaming.streams import streaming_upsert_sink

    target = str(tmp_path / "target")
    src = str(tmp_path / "updates")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [Row(user_id=1, ts=0, value=0.0), Row(user_id=2, ts=0, value=0.0)]
    ).write.parquet(target)
    # three source files -> maxFilesPerTrigger=1 forces three sequential
    # micro-batch merges (ts unique per user so keep-latest is total)
    for i, rows in enumerate(
        [
            [Row(user_id=1, ts=10, value=1.0)],
            [Row(user_id=2, ts=20, value=2.0), Row(user_id=3, ts=20, value=3.0)],
            [Row(user_id=1, ts=5, value=-1.0)],  # older than ts=10: must lose
        ]
    ):
        spark.createDataFrame(rows).write.parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    streaming_upsert_sink(stream, target, ["user_id"], "ts", ckpt)
    got = {r.user_id: (r.ts, r.value) for r in spark.read.parquet(target).collect()}
    assert got == {1: (10, 1.0), 2: (20, 2.0), 3: (20, 3.0)}


def test_rolling_agg_trailing_window(spark):
    import datetime as dt

    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.streaming.windows import rolling_agg

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            Row(event_id=1, user_id=7, ts=t0, value=1.0),
            Row(event_id=2, user_id=7, ts=t0 + dt.timedelta(minutes=30), value=2.0),
            # exactly 3600s after event 1: still inside the inclusive frame
            Row(event_id=3, user_id=7, ts=t0 + dt.timedelta(hours=1), value=4.0),
            # 3601s after event 1: event 1 falls out
            Row(event_id=4, user_id=7, ts=t0 + dt.timedelta(hours=2), value=8.0),
            Row(event_id=5, user_id=9, ts=t0, value=16.0),  # other user isolated
        ]
    )
    got = {r.event_id: (r.n_trailing, r.sum_trailing) for r in rolling_agg(ev).collect()}
    assert got == {
        1: (1, 1.0),
        2: (2, 3.0),
        3: (3, 7.0),
        4: (2, 12.0),  # events 3+4 (event 2 is 5400s back)
        5: (1, 16.0),
    }


def test_funnel_steps_ordering_and_ties(spark):
    import datetime as dt

    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.streaming.windows import funnel_steps

    t = lambda m: dt.datetime(2024, 1, 1, 10, m, 0)
    ev = spark.createDataFrame(
        [
            # user 1: full funnel in order
            Row(event_id=1, user_id=1, ts=t(0), event_type="view"),
            Row(event_id=2, user_id=1, ts=t(5), event_type="click"),
            Row(event_id=3, user_id=1, ts=t(9), event_type="purchase"),
            # user 2: click BEFORE view never counts; later click does
            Row(event_id=4, user_id=2, ts=t(0), event_type="click"),
            Row(event_id=5, user_id=2, ts=t(1), event_type="view"),
            Row(event_id=6, user_id=2, ts=t(2), event_type="click"),
            # user 3: tie (click at the same ts as view) must not advance
            Row(event_id=7, user_id=3, ts=t(0), event_type="view"),
            Row(event_id=8, user_id=3, ts=t(0), event_type="click"),
            # user 4: never enters the funnel
            Row(event_id=9, user_id=4, ts=t(0), event_type="error"),
        ]
    )
    got = {r.user_id: r for r in funnel_steps(ev).collect()}
    assert got[1].steps_completed == 3 and got[1].step3_ts == t(9)
    assert got[2].steps_completed == 2 and got[2].step2_ts == t(2)
    assert got[3].steps_completed == 1 and got[3].step2_ts is None
    assert got[4].steps_completed == 0 and got[4].step1_ts is None


def test_cohort_retention_offsets(spark):
    import datetime as dt

    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.streaming.windows import cohort_retention

    d = lambda day, h: dt.datetime(2024, 1, day, h, 0, 0)
    ev = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=d(1, 9), event_type="view"),
            Row(event_id=2, user_id=1, ts=d(1, 23), event_type="click"),  # same day
            Row(event_id=3, user_id=1, ts=d(3, 1), event_type="view"),  # +2 days
            Row(event_id=4, user_id=2, ts=d(1, 12), event_type="view"),  # same cohort
            Row(event_id=5, user_id=3, ts=d(2, 0), event_type="view"),  # next cohort
        ]
    )
    got = {
        (r.cohort_day, r.day_offset): r.n_users for r in cohort_retention(ev).collect()
    }
    jan = lambda day: dt.datetime(2024, 1, day)
    assert got == {(jan(1), 0): 2, (jan(1), 2): 1, (jan(2), 0): 1}


def test_merge_additive_incremental_equals_recompute(spark, tmp_path):
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.io import merge_additive

    base = str(tmp_path / "rollup")
    day1 = spark.createDataFrame(
        [Row(k="a", n=2, v=10.0), Row(k="b", n=1, v=5.0)]
    )
    day1.write.parquet(base)
    day2 = spark.createDataFrame([Row(k="a", n=3, v=7.0), Row(k="c", n=1, v=1.0)])
    day3 = spark.createDataFrame([Row(k="b", n=4, v=2.0)])

    merge_additive(spark, base, day2, keys=["k"], sum_cols=["n", "v"])
    out = merge_additive(spark, base, day3, keys=["k"], sum_cols=["n", "v"])
    got = {r.k: (r.n, r.v) for r in out.collect()}
    # folding deltas one at a time == one full recompute
    assert got == {"a": (5, 17.0), "b": (5, 7.0), "c": (1, 1.0)}
    # and the result was durably written back
    again = {r.k: (r.n, r.v) for r in spark.read.parquet(base).collect()}
    assert again == got


def test_read_parquet_evolving_merges_schemas(spark, tmp_path):
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.io import read_parquet_evolving

    p1 = str(tmp_path / "v1")
    p2 = str(tmp_path / "v2")
    spark.createDataFrame([Row(k=1, a="x")]).write.parquet(p1)
    spark.createDataFrame([Row(k=2, a="y", b=9)]).write.parquet(p2)  # writer added b
    out = read_parquet_evolving(spark, p1, p2)
    assert set(out.columns) == {"k", "a", "b"}
    got = {r.k: (r.a, r.b) for r in out.collect()}
    assert got == {1: ("x", None), 2: ("y", 9)}


def test_zscore_anomalies_semantics(spark):
    """n<2 predecessors -> null score; constant history -> null score
    (zero variance); a genuine outlier after stable history flags."""
    from uofi_payroll_etl_main_spark.streaming.windows import zscore_anomalies

    rows = [
        # event_id, ts, key, value: 6 stable values then an outlier
        (0, "2024-01-01 00:00:00", "a", 10.0),
        (1, "2024-01-01 00:01:00", "a", 12.0),
        (2, "2024-01-01 00:02:00", "a", 11.0),
        (3, "2024-01-01 00:03:00", "a", 10.5),
        (4, "2024-01-01 00:04:00", "a", 11.5),
        (5, "2024-01-01 00:05:00", "a", 100.0),
        # constant-history key: variance 0 -> null scores throughout
        (6, "2024-01-01 00:00:00", "b", 5.0),
        (7, "2024-01-01 00:01:00", "b", 5.0),
        (8, "2024-01-01 00:02:00", "b", 5.0),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    out = {r.event_id: r for r in zscore_anomalies(df, window_rows=50, by="event_type").collect()}
    assert out[0].zscore is None and not out[0].is_anomaly   # no predecessors
    assert out[1].zscore is None                             # single predecessor
    assert out[2].zscore is not None                         # two predecessors
    assert out[5].is_anomaly and out[5].zscore > 3           # the outlier
    assert all(out[i].zscore is None for i in (6, 7, 8))     # zero variance

    # independent recompute of the outlier's score
    import statistics
    hist = [10.0, 12.0, 11.0, 10.5, 11.5]
    expect = (100.0 - statistics.mean(hist)) / statistics.stdev(hist)
    assert abs(out[5].zscore - round(expect, 6)) < 1e-6


def test_holt_linear_matches_python_recurrence(spark):
    """The array-fold Holt smoother equals an independent sequential
    Python implementation of the textbook recurrences, including the
    trend state and one-step forecast; out-of-order input rows are
    sorted by the order column first."""
    from uofi_payroll_etl_main_spark.streaming.windows import holt_linear

    series = {"a": [10.0, 12.0, 9.0, 14.0, 13.0, 16.0], "b": [5.0], "c": [7.0, 7.0]}
    rows = [
        (k, i, v)
        for k, vs in series.items()
        for i, v in enumerate(vs)
    ]
    rows.reverse()  # feed out of order; holt_linear must sort by `o`
    df = spark.createDataFrame(rows, "k string, o int, v double")
    got = {r.k: r for r in holt_linear(df, "k", "o", "v", alpha=0.5, beta=0.25).collect()}

    for k, vs in series.items():
        l, t = vs[0], 0.0
        for x in vs[1:]:
            l_new = 0.5 * x + 0.5 * (l + t)
            t = 0.25 * (l_new - l) + 0.75 * t
            l = l_new
        r = got[k]
        assert r.n_points == len(vs)
        assert abs(r.level - round(l, 6)) < 1e-9
        assert abs(r.trend - round(t, 6)) < 1e-9
        assert abs(r.forecast - round(l + t, 6)) < 1e-9
    assert got["b"].trend == 0.0 and got["b"].level == 5.0  # n=1: init state
    assert got["c"].trend == 0.0  # flat series learns no trend


def test_cusum_detects_level_shift(spark):
    """A flat series with a +sigma-scale step must alarm UP shortly
    after the shift and never alarm DOWN; statistics match a pure
    Python replica of Page's recurrences."""
    from uofi_payroll_etl_main_spark.streaming.windows import cusum_alerts

    vals = [10.0, 11.0, 10.0, 9.0, 10.0, 11.0, 10.0, 10.0,
            16.0, 17.0, 16.0, 17.0, 16.0, 16.0, 17.0, 16.0]  # shift at i=9
    rows = [("a", i, v) for i, v in enumerate(vals)]
    rows += [("flat", i, 5.0) for i in range(4)]  # std=0 -> null stats
    df = spark.createDataFrame(rows, "k string, o int, v double")
    got = {r.k: r for r in
           cusum_alerts(df, "k", "o", "v", slack_k=0.5, threshold_h=2.0).collect()}

    import statistics
    mean, std = statistics.mean(vals), statistics.stdev(vals)
    sp = sn = mp = mdn = 0.0
    first_up = first_dn = None
    for i, v in enumerate(vals, 1):
        z = (v - mean) / std
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        mp, mdn = max(mp, sp), max(mdn, sn)
        if first_up is None and sp > 2.0:
            first_up = i
        if first_dn is None and sn > 2.0:
            first_dn = i
    r = got["a"]
    assert r.n_points == len(vals)
    assert abs(r.cusum_max_up - round(mp, 6)) < 1e-9
    assert abs(r.cusum_max_down - round(mdn, 6)) < 1e-9
    assert r.first_alarm_up == first_up and first_up is not None
    # global standardization puts pre-shift values below the mean, so
    # the down side legitimately accumulates too -- replica must agree
    assert r.first_alarm_down == first_dn

    f = got["flat"]
    assert f.cusum_max_up is None and f.first_alarm_up is None


def test_ewma_matches_pandas_adjust_form(spark):
    """With the frame longer than the history, the bounded-frame EWMA
    equals pandas' infinite-history ewm(adjust=True) (decay a = 0.9 is
    pandas alpha = 0.1)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from uofi_payroll_etl_main_spark.streaming.windows import ewma

    vals = [10.0, 12.0, 11.0, 30.0, 8.0, 15.0]
    rows = [
        (i, f"2024-01-01 00:0{i}:00", "a", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = {r.event_id: r.ewma for r in ewma(df, alpha=0.9, window_rows=20).collect()}
    expect = pd.Series(vals).ewm(alpha=0.1, adjust=True).mean()
    for i in range(len(vals)):
        assert abs(got[i] - round(expect[i], 6)) < 1e-6, (i, got[i], expect[i])


def test_attribution_lookback_window(spark):
    """Purchase attributes to latest click within 30 min; older clicks
    leave it unattributed; clicks after the purchase never match."""
    import datetime as dt

    from pyspark.sql import Row

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, typ, mins, uid=1):
        return Row(
            event_id=i, user_id=uid, event_type=typ,
            ts=t0 + dt.timedelta(minutes=mins), value=float(i),
        )

    events = spark.createDataFrame(
        [
            ev(1, "click", 0),       # 25 min before purchase -> attributed
            ev(2, "click", -120),    # stale click for user 2's purchase
            ev(3, "purchase", 25),
            ev(4, "purchase", 25, uid=2),
            ev(5, "click", 30, uid=2),  # after the purchase: never matches
        ]
    )
    import uofi_payroll_etl_main_spark.registry_llm as RL

    orig = RL._t
    RL._t = lambda spark_, sf_, name: events
    try:
        out = {r.event_id: r for r in RL.w_attribution(spark, "unused").collect()}
    finally:
        RL._t = orig
    assert out[3].attributed_click_id == 1
    assert out[4].attributed_click_id is None and out[4].attributed_click_ts is None


def test_interval_coverage_merges_overlaps(spark):
    import datetime as dt

    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.streaming.windows import interval_coverage

    t0 = dt.datetime(2024, 1, 1)

    def iv(uid, s_min, e_min):
        return Row(
            user_id=uid,
            iv_start=t0 + dt.timedelta(minutes=s_min),
            iv_end=t0 + dt.timedelta(minutes=e_min),
        )

    df = spark.createDataFrame(
        [
            iv(1, 0, 10), iv(1, 5, 15),    # overlap -> 15 min
            iv(1, 20, 30),                 # disjoint -> +10
            iv(2, 0, 10), iv(2, 0, 10),    # identical -> 10
            iv(3, 0, 30), iv(3, 5, 10),    # contained -> 30
        ]
    )
    got = {r.user_id: r.covered_seconds for r in
           interval_coverage(df, "user_id", "iv_start", "iv_end").collect()}
    assert got == {1: 25 * 60.0, 2: 10 * 60.0, 3: 30 * 60.0}


def test_sessionize_row_level_ids(spark):
    import datetime as dt

    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.streaming.windows import sessionize

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, uid, mins):
        return Row(event_id=i, user_id=uid, ts=t0 + dt.timedelta(minutes=mins))

    df = spark.createDataFrame(
        [
            ev(1, 1, 0), ev(2, 1, 10),     # session 1 (10 < 30 gap)
            ev(3, 1, 50),                  # session 2 (40-min gap)
            ev(4, 1, 55),                  # still session 2
            ev(5, 2, 0),                   # user 2, session 1
        ]
    )
    got = {r.event_id: r.session_id for r in
           sessionize(df, "user_id", "ts", 1800, order_cols=["event_id"]).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_streaming_interval_join_outer_contains_inner(spark, sf_dir):
    """LEFT OUTER drain: matched rows equal the inner join's output;
    outer rows carry nulls and only for clicks whose horizon the final
    watermark passed."""
    import uofi_payroll_etl_main_spark.registry_llm as RL

    inner = {
        (r.click_id, r.purchase_ts): r.purchase_value
        for r in RL.st_interval_join(spark, sf_dir).collect()
    }
    outer_rows = RL.st_interval_join_outer(spark, sf_dir).collect()
    matched = {
        (r.click_id, r.purchase_ts): r.purchase_value
        for r in outer_rows
        if r.purchase_ts is not None
    }
    assert matched == inner              # outer's matched half == inner join
    n_null = sum(1 for r in outer_rows if r.purchase_ts is None)
    assert n_null > 0                    # unconverted clicks actually emit
    null_ids = {r.click_id for r in outer_rows if r.purchase_ts is None}
    assert null_ids.isdisjoint({cid for cid, _ in inner})  # never both


def test_streaming_interval_join_full_is_both_outers(spark, sf_dir):
    """FULL OUTER drain: the click side reproduces the left-outer tier
    exactly, and the purchase side adds orphan purchases the watermark
    proved unmatchable -- the two-sided audit view."""
    import uofi_payroll_etl_main_spark.registry_llm as RL

    left = {
        (r.click_id, r.purchase_ts)
        for r in RL.st_interval_join_outer(spark, sf_dir).collect()
    }
    full_rows = RL.st_interval_join_full(spark, sf_dir).collect()
    click_side = {
        (r.click_id, r.purchase_ts) for r in full_rows if r.click_id is not None
    }
    assert click_side == left
    orphans = [r for r in full_rows if r.click_id is None]
    assert orphans and all(
        r.purchase_id is not None and r.purchase_ts is not None
        and r.click_ts is None and r.user_id is not None
        for r in orphans
    )
    # an orphan purchase never also appears matched
    matched_pids = {
        r.purchase_id for r in full_rows
        if r.click_id is not None and r.purchase_id is not None
    }
    assert matched_pids.isdisjoint({r.purchase_id for r in orphans})


def test_resample_linear_interpolates_interior_gaps(spark):
    """Known 4-hour series with one empty interior bucket: the gap gets
    the straight-line value, edges stay null, observed flags are exact."""
    import datetime as dt

    from uofi_payroll_etl_main_spark.streaming.windows import resample_linear

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows_in = [
        # hour 00: total 10.0 ; hour 01: empty ; hour 02: total 40.0
        (1, t0, "a", 4.0),
        (2, t0 + dt.timedelta(minutes=10), "a", 6.0),
        (3, t0 + dt.timedelta(hours=2), "a", 40.0),
        # group b exists only in hour 01 -> leading/trailing nulls for b
        (4, t0 + dt.timedelta(hours=1), "b", 7.0),
    ]
    df = spark.createDataFrame(rows_in, "event_id long, ts timestamp, event_type string, value double")
    out = {
        (r["window_start"].hour, r["event_type"]): (r["v_interp"], r["observed"])
        for r in resample_linear(df, "1 hour").collect()
    }
    assert out[(0, "a")] == (10.0, True)
    assert out[(1, "a")] == (25.0, False)  # midpoint of 10 -> 40
    assert out[(2, "a")] == (40.0, True)
    assert out[(0, "b")] == (None, False)  # leading gap: no left neighbour
    assert out[(1, "b")] == (7.0, True)
    assert out[(2, "b")] == (None, False)  # trailing gap


class TestTransitions:
    def test_matches_python_model(self, spark):
        from collections import Counter, defaultdict

        import __spark_entry__ as entry

        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in entry.queries()["w_transitions"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        ev = sorted(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .select("user_id", "ts", "event_id", "event_type")
            .collect(),
            key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
        )
        cnt = Counter()
        for a, b in zip(ev, ev[1:]):
            if a["user_id"] == b["user_id"]:
                cnt[(a["event_type"], b["event_type"])] += 1
        totals = defaultdict(int)
        for (f, _), n in cnt.items():
            totals[f] += n
        assert set(got) == set(cnt)
        for k, n in cnt.items():
            assert got[k][0] == n
            assert abs(got[k][1] - n / totals[k[0]]) < 1e-12
        # probabilities row-normalize exactly
        rows = defaultdict(float)
        for (f, _), (_, p) in got.items():
            rows[f] += p
        for f, s in rows.items():
            assert abs(s - 1.0) < 1e-9


class TestFreshness:
    def test_gap_detection(self, spark):
        from pyspark.sql import functions as F

        from uofi_payroll_etl_main_spark.report import check_freshness

        # 8 healthy days of 10 events, then a day with 2 (gap), then 10
        rows_in = []
        eid = 0
        for d in range(1, 9):
            for _ in range(10):
                rows_in.append((eid, f"2024-01-0{d}" if d < 10 else f"2024-01-{d}")); eid += 1
        for _ in range(2):
            rows_in.append((eid, "2024-01-09")); eid += 1
        for _ in range(10):
            rows_in.append((eid, "2024-01-10")); eid += 1
        df = spark.createDataFrame(rows_in, "event_id long, ts string").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        got = {r["day"]: (r["n_events"], r["is_gap"]) for r in check_freshness(df).collect()}
        assert got["2024-01-01"] == (10, False)  # no baseline yet -> never flagged
        assert got["2024-01-09"] == (2, True)    # 2 < 0.5 * 10
        assert got["2024-01-10"][1] is False     # 10 vs mean(~9) healthy

    def test_zero_event_day_appears_as_gap_row(self, spark):
        # a fully dead day has NO input rows; the day spine must still
        # materialize it as a 0-count flagged gap (the headline use
        # case: a dead producer)
        from pyspark.sql import functions as F

        from uofi_payroll_etl_main_spark.report import check_freshness

        rows_in = []
        eid = 0
        for d in (1, 2, 3, 4, 6):  # day 5 is silent
            for _ in range(10):
                rows_in.append((eid, f"2024-02-0{d}")); eid += 1
        df = spark.createDataFrame(rows_in, "event_id long, ts string").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        got = {r["day"]: (r["n_events"], r["is_gap"]) for r in check_freshness(df).collect()}
        assert set(got) == {f"2024-02-0{d}" for d in range(1, 7)}  # complete spine
        assert got["2024-02-05"] == (0, True)  # the dead day is a flagged row
        # the day after the outage compares against a baseline that
        # INCLUDES the 0-count day (true per-calendar-day mean: 8)
        assert got["2024-02-06"] == (10, False)


def test_transform_with_state_matches_apply_in_pandas(spark, event_dir):
    """The Spark-4-native transformWithStateInPandas implementation must
    produce the same final per-user state as the applyInPandasWithState
    one AND as the batch aggregate.  Skips (via the loud capability
    gate) when google.protobuf -- required by transformWithState's
    state-server protocol -- is absent, as in this container."""
    import pyspark.sql.functions as F

    from uofi_payroll_etl_main_spark.streaming.streams import (
        read_event_stream,
        run_to_memory,
        streaming_running_totals_tws,
    )

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        stream0 = read_event_stream(spark, event_dir)
        with pytest.raises(NotImplementedError, match="protobuf"):
            streaming_running_totals_tws(stream0)
        pytest.skip("google.protobuf not installed: transformWithState unavailable")

    stream = read_event_stream(spark, event_dir)
    run_to_memory(
        streaming_running_totals_tws(stream), "tws_stream", timeout_s=180,
        output_mode="update",
    )
    got = (
        spark.table("tws_stream")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    expect = spark.read.parquet(event_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
    )
    g = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in got.collect()}
    e = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in expect.collect()}
    assert g == e and len(g) > 0


def test_streaming_dedup_index_sink(spark, tmp_path):
    """Three micro-batches with cross-batch and in-batch duplicates:
    the landed corpus must hold exactly one copy per distinct
    normalized text, and the index must end keyed to the earliest
    keeper ids."""
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.llm.dedup import build_dedup_index
    from uofi_payroll_etl_main_spark.streaming.streams import (
        streaming_dedup_index_sink,
    )

    index = str(tmp_path / "index")
    out = str(tmp_path / "corpus")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")

    # day-0 corpus seeds the index
    seed = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta"), Row(doc_id=2, text="gamma delta")]
    )
    build_dedup_index(seed, index)

    batches = [
        [Row(doc_id=10, text="ALPHA   beta"),      # dup of seed doc 1 (normalized)
         Row(doc_id=11, text="fresh one")],
        [Row(doc_id=20, text="fresh one"),          # dup of batch-1's doc 11
         Row(doc_id=21, text="fresh two"),
         Row(doc_id=22, text="Fresh   TWO")],       # in-batch dup of 21
        [Row(doc_id=30, text="gamma delta"),        # dup of seed doc 2
         Row(doc_id=31, text="fresh three")],
    ]
    import glob as _glob
    import os as _os

    for i, rows_in in enumerate(batches):
        # ONE part file per logical batch: maxFilesPerTrigger=1 triggers
        # per PART file, so a multi-part write would split a batch's
        # rows (incl. the in-batch dup pair) across micro-batches
        spark.createDataFrame(rows_in).coalesce(1).write.parquet(f"{src}/f{i}")
        # the file source orders micro-batches by modification time;
        # back-to-back writes can land inside one mtime tick under
        # load, which would randomize batch order -- pin distinct,
        # increasing mtimes so batch order is the list order
        stamp = 1_700_000_000 + i * 60
        for part in _glob.glob(f"{src}/f{i}/*"):
            _os.utime(part, (stamp, stamp))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    streaming_dedup_index_sink(stream, index, out, ckpt)

    landed = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert set(landed) == {11, 21, 31}  # one copy per distinct new text
    idx = {r.fingerprint: r.keeper_id for r in spark.read.parquet(index).collect()}
    assert len(idx) == 5  # 2 seed + 3 fresh digests
    assert sorted(idx.values()) == [1, 2, 11, 21, 31]


def test_time_weighted_avg_hand_case(spark):
    """Value 10 held for 30s then 100 for 10s: TWAP = (10*30+100*10)/40
    = 32.5 -- the arithmetic mean (40.0 over the 3 obs) over-weights
    the burst.  Single-observation keys yield null."""
    import datetime

    from uofi_payroll_etl_main_spark.streaming.windows import time_weighted_avg

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "a", t0, 10.0),
        (2, "a", t0 + datetime.timedelta(seconds=30), 100.0),
        (3, "a", t0 + datetime.timedelta(seconds=40), 7.0),   # last: weight 0
        (4, "solo", t0, 99.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, value double")
    got = {r.event_type: r for r in time_weighted_avg(df).collect()}
    assert got["a"].twap == 32.5 and got["a"].span_s == 40
    assert got["a"].n_intervals == 2
    assert "solo" not in got  # no intervals -> no row


def test_resample_locf_carries_forward(spark):
    import datetime

    from uofi_payroll_etl_main_spark.streaming.windows import resample_locf

    t = lambda d, h=0: datetime.datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        (1, "a", t(1, 5), 10.0),
        (2, "a", t(1, 9), 20.0),   # later same day: wins the bucket
        (3, "a", t(4), 40.0),      # days 2-3 are gaps -> carry 20.0
        (4, "b", t(2), 7.0),       # day 1 precedes b's first obs -> null
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, value double")
    got = {(r.event_type, r.window_start.day): r.value_locf
           for r in resample_locf(df, width="1 day").collect()}
    assert got[("a", 1)] == 20.0
    assert got[("a", 2)] == 20.0 and got[("a", 3)] == 20.0
    assert got[("a", 4)] == 40.0
    assert got[("b", 1)] is None
    assert got[("b", 2)] == 7.0 and got[("b", 4)] == 7.0


def test_custom_stream_source_incremental_and_replay(spark):
    """The synthetic_events Python streaming source: (a) incremental
    mode makes multi-batch progress under a processingTime trigger and
    drains exactly n_total rows; (b) offset-range reads are replay-
    deterministic (the exactly-once precondition)."""
    import time

    from uofi_payroll_etl_main_spark.datasources import (
        _RangePartition,
        _SyntheticEventsStreamReader,
        _synth_event,
        register_synthetic_events_source,
    )

    register_synthetic_events_source(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_total", 900)
        .option("rows_per_batch", 300)
        .option("mode", "incremental")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("st_custom_incr")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    t0 = time.time()
    while time.time() - t0 < 90 and spark.table("st_custom_incr").count() < 900:
        time.sleep(0.5)
    q.stop()
    rows = sorted(tuple(r) for r in spark.table("st_custom_incr").collect())
    assert rows == sorted(_synth_event(i) for i in range(900))
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, n_batches  # really multi-batch

    # replay determinism, the recovery contract: same offset range ->
    # identical rows, disjoint ranges -> disjoint ids
    r = _SyntheticEventsStreamReader({"n_total": "100", "n_parts": "3"})
    parts = r.partitions({"i": 10}, {"i": 40})
    assert sum(p.end - p.start for p in parts) == 30
    once = [t for p in parts for t in r.read(_RangePartition(p.start, p.end))]
    twice = [t for p in parts for t in r.read(_RangePartition(p.start, p.end))]
    assert once == twice and len(once) == 30
    assert {t[0] for t in once} == set(range(10, 40))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        _SyntheticEventsStreamReader({"mode": "bogus"})


def test_jsonl_commitlog_sink_exactly_once(spark, tmp_path):
    """Custom streaming sink (jsonl_commitlog): batch-id-keyed promote
    with _SUCCESS markers -- rows land exactly once, and a RESTART from
    the same checkpoint appends nothing (the offsets already
    committed)."""
    import json
    import os
    import time

    from uofi_payroll_etl_main_spark.datasources import (
        _synth_event,
        register_jsonl_commitlog_sink,
        register_synthetic_events_source,
    )

    register_synthetic_events_source(spark)
    register_jsonl_commitlog_sink(spark)
    out, ckpt = str(tmp_path / "log"), str(tmp_path / "ckpt")

    def rows_on_disk():
        n = 0
        if not os.path.isdir(out):
            return 0
        for d in os.listdir(out):
            bd = os.path.join(out, d)
            if d.startswith("batch=") and os.path.exists(os.path.join(bd, "_SUCCESS")):
                for f in os.listdir(bd):
                    if f.endswith(".jsonl"):
                        n += sum(1 for _ in open(os.path.join(bd, f)))
        return n

    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_total", 600).option("rows_per_batch", 200)
        .option("mode", "incremental").load()
    )
    q = (
        sdf.writeStream.format("jsonl_commitlog").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds").start()
    )
    t0 = time.time()
    while time.time() - t0 < 90 and rows_on_disk() < 600:
        time.sleep(0.5)
    q.stop()
    assert rows_on_disk() == 600
    got = []
    for d in sorted(os.listdir(out)):
        bd = os.path.join(out, d)
        if d.startswith("batch="):
            for f in sorted(os.listdir(bd)):
                if f.endswith(".jsonl"):
                    got += [json.loads(line) for line in open(os.path.join(bd, f))]
    assert sorted(r["event_id"] for r in got) == list(range(600))
    sample = next(r for r in got if r["event_id"] == 42)
    want = _synth_event(42)
    assert (sample["user_id"], sample["event_type"], sample["value"]) == (
        want[2], want[3], want[4],
    )
    # restart from the SAME checkpoint: nothing new to consume
    q2 = (
        spark.readStream.format("synthetic_events")
        .option("n_total", 600).option("rows_per_batch", 200)
        .option("mode", "bounded").load()
        .writeStream.format("jsonl_commitlog").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(60)
    assert rows_on_disk() == 600


def test_streaming_zonemap_sink_ingests_and_prunes(spark, tmp_path):
    """streaming_zonemap_sink: micro-batches land under batch-keyed
    names with the zone map refreshed incrementally; range reads prune
    files; a re-drain with the same checkpoint adds nothing; new source
    data folds in on the next drain."""
    import json

    from uofi_payroll_etl_main_spark.layout import (
        read_zonemap_pruned,
        zonemap_candidate_files,
    )
    from uofi_payroll_etl_main_spark.streaming.streams import (
        streaming_zonemap_sink,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "k long, v double"
    )
    df.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_zonemap_sink(stream, tbl, "k", ck, timeout_s=180)

    zm = json.load(open(tmp_path / "tbl" / "_zonemap.json"))
    n_files = len(zm["files"])
    assert n_files >= 4  # one+ file per micro-batch
    assert all(name.startswith("batch") for name in zm["files"])

    # pruned range read: exact rows, and files actually skipped
    got = sorted(
        r.k for r in read_zonemap_pruned(spark, tbl, "k", 100, 199).collect()
    )
    assert got == list(range(100, 200))
    kept, total = zonemap_candidate_files(tbl, "k", 100, 199)
    assert total == n_files and len(kept) < total

    # idempotent re-drain: checkpoint says nothing new
    stream2 = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_zonemap_sink(stream2, tbl, "k", ck, timeout_s=180)
    zm2 = json.load(open(tmp_path / "tbl" / "_zonemap.json"))
    assert zm2["files"] == zm["files"]

    # late arrivals: a second wave folds in and becomes prunable
    spark.createDataFrame(
        [(i, float(i)) for i in range(5000, 5100)], "k long, v double"
    ).coalesce(1).write.mode("append").parquet(src)
    stream3 = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_zonemap_sink(stream3, tbl, "k", ck, timeout_s=180)
    assert read_zonemap_pruned(spark, tbl, "k", 5000, 5099).count() == 100
    zm3 = json.load(open(tmp_path / "tbl" / "_zonemap.json"))
    assert len(zm3["files"]) > n_files


def test_streaming_zonemap_sink_replay_heals_stale_files_and_bounds(
    spark, tmp_path
):
    """ADVICE r9: a replayed batch is not guaranteed to reproduce the
    same part split (repartitionByRange samples boundaries), so a stale
    higher-index batch<id>-<i>.parquet could survive as duplicate rows,
    and an overwritten name kept its OLD zone bounds (false pruning).
    Promotion now deletes leftover same-batch files beyond the new set
    and force-re-stats every promoted name."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from uofi_payroll_etl_main_spark.layout import (
        read_zonemap_pruned,
        zonemap_candidate_files,
    )
    from uofi_payroll_etl_main_spark.streaming.streams import (
        streaming_zonemap_sink,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "k long, v double"
    ).coalesce(1).write.parquet(src)

    def drain(ck):
        stream = spark.readStream.schema("k long, v double").parquet(src)
        streaming_zonemap_sink(stream, tbl, "k", ck, timeout_s=180)

    drain(str(tmp_path / "ck1"))
    names = sorted(
        n for n in os.listdir(tbl) if n.endswith(".parquet")
    )
    assert names and all(n.startswith("batch0-") for n in names)

    # simulate the crash-then-replay hazard: a stale extra file from a
    # previous attempt of the SAME batch, plus corrupted (stale) bounds
    # for one promoted name
    stale = os.path.join(tbl, "batch0-99.parquet")
    pq.write_table(pa.table({"k": [999999], "v": [0.5]}), stale)
    zm_path = os.path.join(tbl, "_zonemap.json")
    doc = json.load(open(zm_path))
    doc["files"][names[0]]["k"] = [10_000_000, 10_000_009]  # stale bounds
    doc["files"]["batch0-99.parquet"] = {"k": [999999, 999999]}
    with open(zm_path, "w") as fh:
        json.dump(doc, fh)

    # fresh checkpoint => batch 0 replays over the same table root
    drain(str(tmp_path / "ck2"))

    assert not os.path.exists(stale), "stale same-batch file survived replay"
    doc2 = json.load(open(zm_path))
    assert "batch0-99.parquet" not in doc2["files"]
    # bounds re-statted from actual content: k range is sane again
    assert all(
        s["k"][0] is None or s["k"][1] <= 999 for s in doc2["files"].values()
    )
    # no duplicates, pruning agrees with a full scan
    assert spark.read.parquet(tbl).count() == 1000
    got = sorted(
        r.k for r in read_zonemap_pruned(spark, tbl, "k", 100, 199).collect()
    )
    assert got == list(range(100, 200))
    kept, total = zonemap_candidate_files(tbl, "k", 100, 199)
    assert len(kept) <= total

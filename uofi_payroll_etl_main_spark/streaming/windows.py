"""Windowed aggregations over event streams (batch mode).

The reference has zero streaming constructs (SURVEY.md section 2.9); the
north-star scope adds windowed event analytics.  These are the batch
forms -- identical expressions power the streaming variants in
`streams.py`.

Scale: F.window is a generated column + ordinary hash aggregation; the
shuffle key is (window, group) so tumbling aggs scale exactly like any
groupBy.  Session windows use Spark's native session_window operator
(merging state machine, spill-capable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from uofi_payroll_etl_main_spark import expressions as E

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "resample_counts_filled",
    "resample_linear",
    "rolling_agg",
    "holt_linear",
    "holt_winters",
    "cusum_alerts",
    "time_weighted_avg",
    "resample_locf",
    "lag_features",
    "funnel_steps",
    "cohort_retention",
    "interval_coverage",
    "sessionize",
    "sliding_distinct_hll",
    "mann_kendall_trend", "theil_sen_slope", "daily_acf", "runs_test",
]


def _metrics():
    """Count + exact decimal sum (order-independent; doubles would make
    the sum run-order-dependent) surfaced as double."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ]


def tumbling_agg(events: DataFrame, width: str = "1 hour", by: str = "event_type") -> DataFrame:
    """Non-overlapping fixed windows; epoch-aligned."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col(by))
        .agg(*_metrics())
        .select(
            F.col("w.start").alias("window_start"),
            F.col(by),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour", by: str = "event_type"
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), F.col(by))
        .agg(*_metrics())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(by),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", by: str = "user_id") -> DataFrame:
    """Sessionization: events within `gap` of each other merge into one
    session per `by` key (native session_window -- the same operator the
    streaming engine uses for stateful session aggregation)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col(by))
        .agg(*_metrics())
        .select(
            F.col(by),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def rolling_agg(
    events: DataFrame,
    trailing_seconds: int = 3600,
    by: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-event trailing-window features: for every event, count + exact
    sum of the SAME user's events in [ts - trailing, ts] (inclusive both
    ends -- RANGE frame over epoch seconds).

    The feature-engineering workhorse (e.g. "events in the last hour" as
    a model input).  One shuffle on the partition key, then a range-frame
    sliding aggregate per partition -- no self-join, no window explode.
    Partitions are per-user so skew follows the user distribution; for a
    whale-user keyspace, pre-bucket by (user, day) and union the
    boundary, same shape as the session rollup.
    """
    from pyspark.sql import Window

    sec = E.epoch_seconds(ts)
    w = (
        Window.partitionBy(by)
        .orderBy(sec)
        .rangeBetween(-int(trailing_seconds), 0)
    )
    return events.select(
        "event_id",
        F.col(by),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col(value).cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing"),
    )


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    by: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per key, the first time each step
    completed STRICTLY AFTER the previous step (ts ties don't advance
    the funnel), plus how many steps completed.

    Each stage is a whole-partition min window over the same partition
    key, so Catalyst plans ONE exchange on `by` and stacks the Window
    operators on it -- no self-joins, no per-step shuffle.  The final
    per-key collapse aggregates on the already-partitioned key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by)
    out = events.select(by, "event_type", ts)
    prev: str | None = None
    names: list[str] = []
    for i, step in enumerate(steps, 1):
        hit = F.col("event_type") == step
        if prev is not None:
            hit = hit & (F.col(ts) > F.col(prev))
        name = f"step{i}_ts"
        out = out.withColumn(name, F.min(F.when(hit, F.col(ts))).over(w))
        names.append(name)
        prev = name
    completed = F.lit(0).cast("long")
    for i, name in enumerate(names, 1):
        completed = F.when(F.col(name).isNotNull(), F.lit(i).cast("long")).otherwise(
            completed
        )
    return (
        out.groupBy(by)
        .agg(*[F.min(n).alias(n) for n in names])
        .select(by, *names, completed.alias("steps_completed"))
    )


def cohort_retention(events: DataFrame, by: str = "user_id", ts: str = "ts") -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort_day, day_offset) the distinct users active that day.

    First-touch is a per-key aggregate; the join back to the fact is
    key-co-partitioned with the aggregate's own shuffle (and AQE
    broadcasts the cohort side when it's small).  The retention matrix
    is buckets x offsets -- metadata-scale output.
    """
    first = events.groupBy(by).agg(
        F.date_trunc("day", F.min(ts)).alias("cohort_day")
    )
    return (
        events.join(first, by)
        .select(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col(ts)), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            F.col(by),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(by).alias("n_users"))
    )


def resample_counts_filled(
    events: DataFrame, width: str = "1 hour", by: str = "event_type"
) -> DataFrame:
    """Gap-filled resample: tumbling counts PLUS zero rows for empty
    buckets, so every (group, bucket) in [min(ts), max(ts)] appears --
    the hypertable-rollup shape (time_bucket + gapfill).

    The spine is sequence+explode over the GLOBAL time range crossed
    with the distinct group keys: spine size = buckets x groups
    (metadata-scale), never fact-scale.  One broadcast of the range, one
    left join on (bucket, group).
    """
    bucket = F.window("ts", width).getField("start").alias("window_start")
    counts = events.groupBy(bucket, F.col(by)).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    # one window expression per projection (Spark rejects two in one)
    rng = events.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    rng = rng.select(F.window("mn", width).getField("start").alias("lo"), "mx")
    rng = rng.select("lo", F.window("mx", width).getField("start").alias("hi"))
    spine_times = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {width}"))).alias("window_start")
    )
    groups = events.select(F.col(by)).distinct()
    spine = spine_times.crossJoin(F.broadcast(groups))
    return (
        spine.join(counts, ["window_start", by], "left")
        .select(
            "window_start",
            F.col(by),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


def zscore_anomalies(
    events: DataFrame,
    window_rows: int = 50,
    threshold: float = 3.0,
    by: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Rolling z-score anomaly flags: each event scored against the
    mean/stddev of the PRECEDING `window_rows` events of the same key
    (strictly preceding -- scoring a point against a window containing
    itself dilutes the signal and leaks label into feature).

    Moments come from exact decimal power sums finished in IEEE double,
    so the score is order-independent and engine-reproducible (same
    recipe as group_stats).  One shuffle on the key; rows with fewer
    than 2 predecessors get a null score, never a spurious flag.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(by)
        .orderBy(E.epoch_micros(ts), F.col("event_id"))
        .rowsBetween(-int(window_rows), -1)
    )
    v = F.col(value).cast("decimal(18,2)")
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w).cast("double")
    s2 = F.sum(v * v).over(w).cast("double")
    mean = s1 / n
    var = F.when(n > 1, (s2 - s1 * s1 / n) / (n - 1))
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col(value) - mean) / std)
    return events.select(
        "event_id",
        F.col(by),
        F.col(value),
        F.round(z, 6).alias("zscore"),
        (F.coalesce(F.abs(z), F.lit(0.0)) > threshold).alias("is_anomaly"),
    )


def ewma(
    events: DataFrame,
    alpha: float = 0.9,
    window_rows: int = 20,
    by: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Exponentially weighted moving average over a bounded trailing
    frame: weight a^0 on the current row decaying to a^n on the oldest
    of the last `window_rows` predecessors, normalized by the realized
    weight sum (so early rows with short history are unbiased, the
    standard "adjust" form).

    True infinite-history EWMA is a sequential recurrence -- on Spark
    that means a per-key sequential pass (applyInPandasWithState /
    applyInPandas), serializing each key's timeline.  The bounded-frame
    form keeps the whole computation inside one window + array fold
    (pure Catalyst, one shuffle) and is numerically identical once
    a^window_rows is below measurement noise (0.9^20 ~ 0.12; size the
    frame to the decay you need).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(by)
        .orderBy(E.epoch_micros(ts), F.col("event_id"))
        .rowsBetween(-int(window_rows), 0)
    )
    vals = F.collect_list(F.col(value).cast("double")).over(w)
    n = F.size(vals)
    a = F.lit(float(alpha))
    # oldest-first list: position i (0-based) gets weight a^(n-1-i)
    weights = F.transform(vals, lambda x, i: F.pow(a, (n - 1 - i).cast("double")))
    weighted = F.transform(vals, lambda x, i: x * F.pow(a, (n - 1 - i).cast("double")))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)  # noqa: E731
    return events.select(
        "event_id",
        F.col(by),
        F.col(value),
        F.round(fold(weighted) / fold(weights), 6).alias("ewma"),
    )


def interval_coverage(
    df,
    key_col: str,
    start_col: str,
    end_col: str,
):
    """Union-length of (possibly overlapping) intervals per key: total
    time covered by at least one interval -- the sweep-line classic
    (machine uptime, user active time, SLA coverage) as ONE window pass.

    Overlap is removed with the running-max trick: each interval's
    effective start is clipped to the max end seen among all EARLIER
    intervals (ordered by start), so overlapped spans contribute zero
    and the per-key sum is exactly the union length.  One shuffle on
    the key; per-row state is a single running max -- no interval
    explosion, no self-join.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .. import expressions as E

    s_us = E.epoch_micros(F.col(start_col))
    e_us = E.epoch_micros(F.col(end_col))
    w = Window.partitionBy(key_col).orderBy(s_us, e_us).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_max_end = F.max(e_us).over(w)
    eff_start = F.greatest(s_us, F.coalesce(prev_max_end, s_us))
    contrib = F.greatest(e_us - eff_start, F.lit(0).cast("long"))
    return (
        df.select(F.col(key_col), contrib.alias("__c"))
        .groupBy(key_col)
        .agg((F.sum("__c") / F.lit(1000000.0)).alias("covered_seconds"))
    )


def sessionize(
    df,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols=None,
    out_col: str = "session_id",
):
    """Row-level sessionization: assign each row its 1-based session
    number within `key_col`, where a gap of more than `gap_seconds`
    since the previous row opens a new session.

    The aggregate form (session_agg / native session_window) loses the
    row; this keeps it -- the primitive behind per-event session
    features, funnel joins, and session-scoped dedup.  One window pass:
    lag to detect boundaries, running sum of boundary flags for the id.
    Deterministic under timestamp ties via `order_cols` tiebreakers.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .. import expressions as E

    us = E.epoch_micros(F.col(ts_col))
    order = [us] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(us).over(w)
    boundary = (prev.isNull() | ((us - prev) > int(gap_seconds) * 1_000_000)).cast("long")
    sid = F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(out_col, sid)


def resample_linear(
    events: DataFrame,
    width: str = "1 hour",
    by: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """Gap-filled resample with LINEAR interpolation: per-bucket exact
    value totals on a dense (group x bucket) grid, with empty interior
    buckets filled by the straight line between their nearest observed
    neighbours (leading/trailing gaps stay null; `observed` marks real
    buckets).

    The time-series regularization shape (pandas `resample().sum().
    interpolate()` / timescale `interpolate()`): model features and
    charts need a dense grid, and zero-fill lies for quantities that
    accumulate between ticks.

    Scale: the grid is buckets x groups (metadata-sized, never
    fact-scale), built exactly like `resample_counts_filled`; the fill
    is two ignore-nulls running windows (prev/next observed struct) per
    group -- one shuffle on the group key, no self-join, no UDF.  The
    interpolation arithmetic is a fixed-order double expression so the
    DuckDB oracle reproduces it bit-for-bit.
    """
    from pyspark.sql import Window

    bucket = F.window("ts", width).getField("start").alias("window_start")
    obs = events.groupBy(bucket, F.col(by)).agg(
        F.sum(F.col(value).cast("decimal(18,2)")).cast("double").alias("v_obs")
    )
    rng = events.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    rng = rng.select(F.window("mn", width).getField("start").alias("lo"), "mx")
    rng = rng.select("lo", F.window("mx", width).getField("start").alias("hi"))
    spine_times = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {width}"))).alias(
            "window_start"
        )
    )
    groups = events.select(F.col(by)).distinct()
    grid = spine_times.crossJoin(F.broadcast(groups))
    j = grid.join(obs, ["window_start", by], "left").withColumn(
        "__t", E.epoch_seconds("window_start")
    )
    w_prev = (
        Window.partitionBy(by)
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(by)
        .orderBy("window_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    has = F.col("v_obs").isNotNull()
    pv = F.last(F.when(has, F.col("v_obs")), ignorenulls=True).over(w_prev)
    pt = F.last(F.when(has, F.col("__t")), ignorenulls=True).over(w_prev)
    nv = F.first(F.when(has, F.col("v_obs")), ignorenulls=True).over(w_next)
    nt = F.first(F.when(has, F.col("__t")), ignorenulls=True).over(w_next)
    frac = (F.col("__t") - pt).cast("double") / (nt - pt).cast("double")
    interp = (
        F.when(has, F.col("v_obs"))
        .when(pv.isNotNull() & nv.isNotNull(), pv + (nv - pv) * frac)
        .otherwise(F.lit(None).cast("double"))
    )
    return j.select(
        "window_start",
        F.col(by),
        interp.alias("v_interp"),
        has.alias("observed"),
    )


def holt_linear(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) per key
    over an ORDERED series, finishing with the one-step-ahead forecast
    -- the capacity-planning primitive EWMA can't provide because EWMA
    has no trend state.

        l_i = alpha*v_i + (1-alpha)*(l_{i-1} + t_{i-1})
        t_i = beta*(l_i - l_{i-1}) + (1-beta)*t_{i-1}

    initialized l_0 = v_0, t_0 = 0.  The recurrence is inherently
    sequential per key, so it runs as ONE array fold (F.aggregate) over
    the key's sorted series -- pure Catalyst, one shuffle, no Python.

    Scale contract: the input must already be an AGGREGATED series
    (e.g. daily counts), so the per-key array is grain-cardinality
    (metadata-scale), never raw-event-scale -- the same contract as
    resample_counts_filled.  Feed raw events through a groupBy first.

    Dyadic defaults (0.5, 0.25) keep every multiply exact in IEEE
    doubles, so results are bit-identical across engines that fold in
    the same order.
    """
    a = float(alpha)
    b = float(beta)
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v"))
        )
    )
    agg = df.groupBy(key_col).agg(
        F.transform(ordered, lambda s: s.getField("v")).alias("__vs")
    )
    vs = F.col("__vs")
    init = F.struct(
        F.element_at(vs, 1).alias("l"), F.lit(0.0).alias("t")
    )
    rest = F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0)))

    def _step(acc, x):
        # t uses the algebraic identity l_new - l = a*(x-l) + (1-a)*t so
        # neither field repeats the other's subexpression -- keeps the
        # fold shape expressible in engines whose lambda layer can't
        # share subexpressions across struct fields (the DuckDB oracle
        # folds the exact same operation order for bit parity).
        l_prev, t_prev = acc.getField("l"), acc.getField("t")
        l_new = F.lit(a) * x + F.lit(1.0 - a) * (l_prev + t_prev)
        t_new = (
            F.lit(b) * (F.lit(a) * (x - l_prev) + F.lit(1.0 - a) * t_prev)
            + F.lit(1.0 - b) * t_prev
        )
        return F.struct(l_new.alias("l"), t_new.alias("t"))

    st = F.aggregate(rest, init, _step)
    return agg.select(
        key_col,
        F.size(vs).cast("long").alias("n_points"),
        F.round(st.getField("l"), 6).alias("level"),
        F.round(st.getField("t"), 6).alias("trend"),
        F.round(st.getField("l") + st.getField("t"), 6).alias("forecast"),
    )


def holt_winters(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.5,
) -> DataFrame:
    """Additive Holt-Winters triple-exponential smoothing per key over
    an ORDERED series: level + linear trend + a length-`period`
    additive seasonal profile -- what `holt_linear` can't model when
    the series has a weekly/diurnal cycle.

        l_i = alpha*(v_i - s_{i-m}) + (1-alpha)*(l_{i-1} + t_{i-1})
        t_i = beta*(l_i - l_{i-1}) + (1-beta)*t_{i-1}
        s_i = gamma*(v_i - l_i) + (1-gamma)*s_{i-m}

    initialized from the first full season: l = mean(v_1..v_m), t = 0,
    s_j = v_j - mean(v_1..v_m).  The recurrence is inherently
    sequential per key, so it runs as ONE array fold (F.aggregate) over
    the sorted series with a flat double-array state
    [l, t, s_next, ..., s_next+m-1] rotated one slot per step -- pure
    Catalyst, one shuffle, no Python, no window over windows.

    Scale contract: identical to holt_linear -- the input must already
    be an AGGREGATED series (e.g. daily counts), so each key's array is
    grain-cardinality (metadata-scale), never raw-event-scale.

    Keys with n_points <= period emit NULL smoothing fields (not
    enough data to seed the seasonal profile).  Dyadic defaults
    (0.5, 0.25, 0.5) keep every multiply exact in IEEE doubles; the
    init mean divides by the period, so bit parity with the DuckDB
    oracle additionally relies on both engines folding the init sum
    and every step in the same order (they do -- the lambda bodies are
    transliterations).
    """
    a, b, g, m = float(alpha), float(beta), float(gamma), int(period)
    if m < 2:
        raise ValueError("holt_winters: period must be >= 2 (use holt_linear)")
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v"))
        )
    )
    agg = df.groupBy(key_col).agg(
        F.transform(ordered, lambda s: s.getField("v")).alias("__vs")
    )
    vs = F.col("__vs")
    # Init from the first season: left-fold sum starting at 0.0 (IEEE:
    # 0.0 + v1 == v1, so the chain matches DuckDB's no-init list_reduce).
    mean0 = F.aggregate(
        F.slice(vs, 1, m), F.lit(0.0), lambda acc, x: acc + x
    ) / F.lit(float(m))
    init = F.concat(
        F.array(mean0, F.lit(0.0)),
        F.transform(F.slice(vs, 1, m), lambda x: x - mean0),
    )
    rest = F.slice(vs, m + 1, F.greatest(F.size(vs) - m, F.lit(0)))

    def _step(acc, x):
        # State layout (1-based): [1]=l, [2]=t, [3..m+2]=seasonals with
        # [3] the one this step consumes.  l_new is inlined into t_new
        # and s_new (no struct-field CSE assumed) so the DuckDB oracle
        # can fold the exact same operation order for bit parity.
        l_prev, t_prev, s_cur = (
            F.element_at(acc, 1),
            F.element_at(acc, 2),
            F.element_at(acc, 3),
        )

        def l_new():
            return F.lit(a) * (x - s_cur) + F.lit(1.0 - a) * (l_prev + t_prev)

        t_new = F.lit(b) * (l_new() - l_prev) + F.lit(1.0 - b) * t_prev
        s_new = F.lit(g) * (x - l_new()) + F.lit(1.0 - g) * s_cur
        return F.concat(
            F.array(l_new(), t_new),
            F.slice(acc, 4, m - 1),
            F.array(s_new),
        )

    st = F.when(F.size(vs) > m, F.aggregate(rest, init, _step))
    return agg.select(
        key_col,
        F.size(vs).cast("long").alias("n_points"),
        F.round(F.element_at(st, 1), 6).alias("level"),
        F.round(F.element_at(st, 2), 6).alias("trend"),
        F.round(F.element_at(st, 3), 6).alias("season_next"),
        F.round(
            F.element_at(st, 1) + F.element_at(st, 2) + F.element_at(st, 3), 6
        ).alias("forecast"),
    )


def cusum_alerts(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per key (Page 1954): the
    classic drift alarm for pipeline monitoring -- a level shift that
    per-point z-score tests miss accumulates until the statistic
    crosses h.

    Each key's ordered series is standardized by its own mean/std
    (decimal power sums -> IEEE finish, the group_stats discipline),
    then folded through

        sp_i = max(0, sp_{i-1} + z_i - k)     (upward shifts)
        sn_i = max(0, sn_{i-1} - z_i - k)     (downward shifts)

    with slack k and alarm threshold h, in ONE Catalyst array fold --
    the same sequential-recurrence-as-fold shape as holt_linear, with
    the same scale contract: input is an already-aggregated series
    (grain-cardinality per key, never raw-event-scale).

    Returns per key: n_points, cusum_max_up/down (the peak statistics)
    and first_alarm_up/down (1-based series index of the first h
    crossing, null if none).  Constant series (std = 0) yield null
    statistics rather than dividing by zero.
    """
    kk = float(slack_k)
    hh = float(threshold_h)
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v"))
        )
    )
    x = F.col("__x")
    agg = df.groupBy(key_col).agg(
        F.transform(ordered, lambda s: s.getField("v")).alias("__vs"),
        F.count(F.col(value_col)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__sy"),
        F.sum(
            F.col(value_col).cast("decimal(18,2)") * F.col(value_col).cast("decimal(18,2)")
        ).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    sy = F.col("__sy").cast("double")
    syy = F.col("__syy").cast("double")
    var = (syy - sy * sy / n) / (n - F.lit(1.0))
    agg = agg.withColumn("__mean", sy / n).withColumn(
        "__std", F.when((F.col("__n") > 1) & (var > 0), F.sqrt(var))
    )
    zs = F.transform(F.col("__vs"), lambda v: (v - F.col("__mean")) / F.col("__std"))
    # state: [sp, sn, max_sp, max_sn, first_up, first_dn, i]
    init = F.array(*[F.lit(0.0)] * 4, F.lit(-1.0), F.lit(-1.0), F.lit(0.0))

    def _step(acc, z):
        sp = F.greatest(F.lit(0.0), acc[0] + z - F.lit(kk))
        sn = F.greatest(F.lit(0.0), acc[1] - z - F.lit(kk))
        i = acc[6] + F.lit(1.0)
        first_up = F.when((acc[4] < 0) & (sp > F.lit(hh)), i).otherwise(acc[4])
        first_dn = F.when((acc[5] < 0) & (sn > F.lit(hh)), i).otherwise(acc[5])
        return F.array(
            sp, sn, F.greatest(acc[2], sp), F.greatest(acc[3], sn), first_up, first_dn, i
        )

    st = F.when(F.col("__std").isNotNull(), F.aggregate(zs, init, _step))
    out = agg.withColumn("__st", st)
    idx = lambda i: F.col("__st")[i]  # noqa: E731
    as_alarm = lambda c: F.when(c >= 0, c.cast("long"))  # noqa: E731
    return out.select(
        key_col,
        F.size(F.col("__vs")).cast("long").alias("n_points"),
        F.round(idx(2), 6).alias("cusum_max_up"),
        F.round(idx(3), 6).alias("cusum_max_down"),
        as_alarm(idx(4)).alias("first_alarm_up"),
        as_alarm(idx(5)).alias("first_alarm_down"),
    )


def time_weighted_avg(
    events: DataFrame,
    by: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Time-weighted average per key: each observation weighted by how
    long it was the CURRENT value (seconds until the next observation)
    -- the correct mean for state-like series sampled at irregular
    times, where the arithmetic mean over-weights bursts (TWAP in
    finance, time-in-state in telemetry).  The last observation per
    key has no successor and carries zero weight (half-open interval
    convention).

    One shuffle on the key: lead() and the weighted sums ride the same
    partition.  Weights are integer seconds times DECIMAL values, so
    the sums are exact and order-independent; the division finishes in
    IEEE double.  Keys with a single observation (no intervals) yield
    null.
    """
    from pyspark.sql import Window

    sec = E.epoch_seconds(ts)
    w = Window.partitionBy(by).orderBy(sec, F.col("event_id"))
    dt = (F.lead(sec).over(w) - sec).cast("decimal(18,0)")
    v = F.col(value).cast("decimal(18,6)")
    agg = (
        events.select(F.col(by), dt.alias("__dt"), v.alias("__v"))
        .filter(F.col("__dt").isNotNull())
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("__v") * F.col("__dt")).alias("__wsum"),
            F.sum("__dt").alias("__tsum"),
        )
    )
    twap = F.when(
        F.col("__tsum") > 0,
        F.col("__wsum").cast("double") / F.col("__tsum").cast("double"),
    )
    return agg.select(
        by,
        "n_intervals",
        F.round(twap, 6).alias("twap"),
        F.col("__tsum").cast("long").alias("span_s"),
    )


def resample_locf(
    events: DataFrame,
    width: str = "1 hour",
    by: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Gap-filled resample with last-observation-carried-forward: every
    (group, bucket) on the global spine gets the group's most recent
    observed value at-or-before that bucket -- the state-series fill
    policy (sensor readings, account balances) completing the family:
    zeros (resample_counts_filled) / linear (resample_linear) / LOCF.

    Per-bucket "last observation" is a max(struct(ts, event_id,
    value)) aggregate (map-side combined, deterministic tie-break);
    the carry-forward is one last(ignorenulls) window along the
    metadata-scale spine, so the fill never touches fact rows.
    Buckets before a group's first observation stay null.
    """
    from pyspark.sql import Window

    bucket = F.window(ts, width).getField("start").alias("window_start")
    sec = E.epoch_seconds(ts)
    per_bucket = (
        events.groupBy(bucket, F.col(by))
        .agg(
            F.max(
                F.struct(
                    sec.alias("s"),
                    F.col("event_id").alias("e"),
                    F.col(value).cast("double").alias("v"),
                )
            ).getField("v").alias("__obs")
        )
    )
    rng = events.agg(F.min(ts).alias("mn"), F.max(ts).alias("mx"))
    rng = rng.select(F.window("mn", width).getField("start").alias("lo"), "mx")
    rng = rng.select("lo", F.window("mx", width).getField("start").alias("hi"))
    spine_times = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {width}"))).alias("window_start")
    )
    groups = events.select(F.col(by)).distinct()
    spine = spine_times.crossJoin(F.broadcast(groups))
    w = (
        Window.partitionBy(by)
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(per_bucket, ["window_start", by], "left")
        .select(
            "window_start",
            F.col(by),
            F.round(F.last("__obs", ignorenulls=True).over(w), 6).alias("value_locf"),
        )
    )


def lag_features(
    events: DataFrame,
    by: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value: str = "value",
    lags: tuple[int, ...] = (1, 7),
) -> DataFrame:
    """Per-key lag-feature matrix: for every observation, the value 1,
    7, ... steps back in the SAME key's ordered series -- the
    feature-engineering primitive behind autoregressive models and
    "vs last period" dashboards.  ALL lags ride ONE window over ONE
    key shuffle (Catalyst stacks the lag() calls on a single sort);
    early rows get nulls, never wraparound.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(*[F.col(c) for c in order_cols])
    v = F.col(value).cast("double")
    return events.select(
        "event_id",
        F.col(by),
        v.alias(value),
        *[F.lag(v, int(k)).over(w).alias(f"lag_{k}") for k in lags],
    )


def sliding_distinct_hll(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_slices: int = 7,
) -> DataFrame:
    """Sliding-window distinct count the way a 100 TB pipeline actually
    computes it: ONE HLL sketch per day slice, each sketch merged into
    the `window_slices` trailing windows it supports (hll_union_agg),
    estimate per report day -- sketches are built once and REUSED
    across overlapping windows, so daily incremental cost is one slice
    scan + K sketch merges, never a rescan of the trailing week.

    The exact sibling (w_dau_wau) explodes (user, day) activity into
    its report days -- correct, but its shuffle carries user-grain
    rows times K; this tier's merge stage moves only sketch bytes
    (days x K rows).  Estimate error ~1% at the default sketch size;
    the gate records rows-only and pytest bounds the estimate against
    the exact tier.

    Returns (day, wau_est) for every day with at least one active
    slice in its trailing window.  Sketches are md5-register HLLs
    (aggregates.hll_md5_registers), deterministic across engines, so
    the gate value-checks the estimates against a DuckDB replica.
    """
    from ..aggregates import hll_md5_estimate, hll_md5_registers

    per_slice = hll_md5_registers(
        events.select(
            F.date_trunc("day", F.col(ts_col).cast("timestamp")).alias("__slice"),
            F.col(key_col),
        ),
        ["__slice"],
        key_col,
    )
    contrib = per_slice.select(
        "__reg",
        "__mj",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(window_slices) - 1))
        ).alias("__off"),
        F.col("__slice"),
    ).select(
        (F.col("__slice") + F.make_dt_interval(F.col("__off"))).alias("day"),
        "__reg",
        "__mj",
    )
    merged = contrib.groupBy("day", "__reg").agg(F.max("__mj").alias("__mj"))
    return hll_md5_estimate(merged, ["day"], "wau_est").orderBy("day")


def mann_kendall_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_expr: Column | None = None,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per key over the daily series
    (the nonparametric drift/trend screen that pairs with w_cusum's
    change-point alarm): S = sum over day pairs of sign(v_j - v_i),
    tie-corrected variance, continuity-corrected z.  S and the tie
    terms are INTEGERS (exact on both engines); only the final z is a
    rounded double -- fully value-checkable.

    Scale shape: the pair join is per-key over the DAILY aggregate
    (days^2 per key, never event-grain); tie counts are one more
    group-by on the same daily table.
    """
    v = value_expr if value_expr is not None else F.count(F.lit(1))
    daily = (
        df.groupBy(
            F.col(key_col).alias("k"),
            F.col(ts_col).cast("date").alias("d"),
        )
        .agg(v.cast("long").alias("v"))
        .localCheckpoint(eager=True)
    )
    a = daily.select(F.col("k"), F.col("d").alias("di"), F.col("v").alias("vi"))
    b = daily.select(F.col("k"), F.col("d").alias("dj"), F.col("v").alias("vj"))
    s = (
        a.join(b, "k")
        .filter(F.col("di") < F.col("dj"))
        .groupBy("k")
        .agg(
            F.sum(F.signum(F.col("vj") - F.col("vi")).cast("long")).alias("s_stat")
        )
    )
    n = daily.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        daily.groupBy("k", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("k")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long").alias("tie_term")
        )
    )
    base = n.join(ties, "k").join(s, "k")
    var = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ).cast("double") / F.lit(18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return base.select(
        F.col("k").alias(key_col),
        "n_days",
        "s_stat",
        F.round(var, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.signum(F.col("s_stat")).cast("long").alias("trend"),
    )


def theil_sen_slope(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_expr: Column | None = None,
) -> DataFrame:
    """Theil-Sen robust slope per key: the LOWER MEDIAN of all pairwise
    daily slopes (value change / day gap) -- the estimator that pairs
    with the Mann-Kendall test (same daily pair table; MK answers "is
    there a trend", this answers "how steep").  Slopes are rounded to
    9 digits before ranking so the median pick is engine-exact; the
    lower median (element ceil(m/2) of the sorted slopes) avoids the
    float averaging a true median needs on even counts.
    """
    from pyspark.sql import Window

    v = value_expr if value_expr is not None else F.count(F.lit(1))
    daily = (
        df.groupBy(
            F.col(key_col).alias("k"),
            F.col(ts_col).cast("date").alias("d"),
        )
        .agg(v.cast("long").alias("v"))
        .localCheckpoint(eager=True)
    )
    a = daily.select(F.col("k"), F.col("d").alias("di"), F.col("v").alias("vi"))
    b = daily.select(F.col("k"), F.col("d").alias("dj"), F.col("v").alias("vj"))
    slopes = (
        a.join(b, "k")
        .filter(F.col("di") < F.col("dj"))
        .select(
            "k",
            F.round(
                (F.col("vj") - F.col("vi")).cast("double")
                / F.datediff("dj", "di"),
                9,
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("k").orderBy("slope")
    m = Window.partitionBy("k")
    return (
        slopes.withColumn("__rn", F.row_number().over(w))
        .withColumn("__m", F.count(F.lit(1)).over(m))
        .filter(F.col("__rn") == F.ceil(F.col("__m") / 2))
        .select(
            F.col("k").alias(key_col),
            F.col("__m").cast("long").alias("n_pairs"),
            F.col("slope").alias("slope_per_day"),
        )
    )


def daily_acf(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation of the daily-volume series at lags 1..max_lag
    per key -- the seasonality/persistence diagnostic that complements
    w_seasonal_decompose (a weekly cycle shows as a lag-7 peak).

    Exactness discipline: every aggregate is an INTEGER power sum
    (sum v_t, sum v_t^2 over the series; sum v_t*v_{t+k} and the two
    one-sided sums over each lag window), combined into the standard
    ACF estimator r_k = (S11 - mean*(S1a+S1b) + n_k*mean^2) / (Svv -
    Sv^2/n) in ONE final double expression, rounded 6 -- no float
    accumulates across rows, so the value oracle is exact.  Lags fan
    out as a bounded explode on the DAILY table (days x max_lag rows).
    """
    daily = (
        df.groupBy(
            F.col(key_col).alias("k"),
            F.col(ts_col).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .localCheckpoint(eager=True)
    )
    tot = daily.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    a = daily.select("k", F.col("d").alias("da"), F.col("v").alias("va"))
    b = daily.select("k", F.col("d").alias("db"), F.col("v").alias("vb"))
    lagged = (
        a.join(b, "k")
        .withColumn("lag", F.datediff("db", "da"))
        .filter((F.col("lag") >= 1) & (F.col("lag") <= int(max_lag)))
        .groupBy("k", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_k"),
            F.sum(F.col("va") * F.col("vb")).cast("long").alias("s11"),
            F.sum("va").cast("long").alias("s1a"),
            F.sum("vb").cast("long").alias("s1b"),
        )
    )
    mean = F.col("sv").cast("double") / F.col("n")
    denom = F.col("svv").cast("double") - F.col("sv").cast("double") * F.col("sv") / F.col("n")
    num = (
        F.col("s11").cast("double")
        - mean * (F.col("s1a") + F.col("s1b")).cast("double")
        + F.col("n_k").cast("double") * mean * mean
    )
    return (
        lagged.join(F.broadcast(tot), "k")
        .select(
            F.col("k").alias(key_col),
            F.col("lag").cast("long").alias("lag"),
            "n_k",
            F.round(num / denom, 6).alias("acf"),
        )
    )


def runs_test(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily-volume
    series per key: days are labeled above/below their key's MEDIAN
    volume (exact lower median, ties-to-below), runs = label changes
    + 1 over the day order, compared to the closed-form expectation
    2*n1*n2/n + 1 -- too FEW runs means clustering/regime behavior,
    too many means oscillation.  Counts are integers end-to-end; only
    the final z is a rounded double, so the gate is fully
    value-checked.  One daily aggregate + two windows per key.
    """
    from pyspark.sql import Window

    daily = (
        df.groupBy(
            F.col(key_col).alias("k"),
            F.col(ts_col).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    wk = Window.partitionBy("k")
    w_rank = Window.partitionBy("k").orderBy("v", "d")
    med = (
        daily.withColumn("__rn", F.row_number().over(w_rank))
        .withColumn("__n", F.count(F.lit(1)).over(wk))
        .filter(F.col("__rn") == F.ceil(F.col("__n") / 2))
        .select("k", F.col("v").alias("__med"))
    )
    lab = (
        daily.join(med, "k")
        .select("k", "d", (F.col("v") > F.col("__med")).cast("int").alias("a"))
    )
    w_ord = Window.partitionBy("k").orderBy("d")
    runs = (
        lab.withColumn("__prev", F.lag("a").over(w_ord))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("a").cast("long").alias("n_above"),
            (
                F.sum(
                    F.when(
                        F.col("__prev").isNull()
                        | (F.col("a") != F.col("__prev")),
                        1,
                    ).otherwise(0)
                )
            ).cast("long").alias("n_runs"),
        )
    )
    n1 = F.col("n_above").cast("double")
    n2 = (F.col("n_days") - F.col("n_above")).cast("double")
    n = F.col("n_days").cast("double")
    mu = 2 * n1 * n2 / n + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    )
    return runs.select(
        F.col("k").alias(key_col),
        "n_days",
        "n_above",
        "n_runs",
        F.round(mu, 6).alias("expected_runs"),
        F.round(
            F.when(var > 0, (F.col("n_runs") - mu) / F.sqrt(var)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("z"),
    )

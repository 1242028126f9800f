"""Structured Streaming variants of the windowed analytics.

readStream -> watermark -> windowed agg -> writeStream.  The aggregation
expressions are shared with the batch module, so correctness validated
in batch mode carries over; the only streaming-specific pieces are the
watermark (bounds state for late data) and the sink trigger.

Tested with Trigger.AvailableNow over a parquet directory + memory sink
(tests/test_streaming.py): processes all existing files as a bounded
stream -- the recommended pattern for batch-backfill of a streaming
pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "read_event_stream",
    "streaming_tumbling_counts",
    "streaming_distinct_hll",
    "streaming_sliding_counts",
    "streaming_session_counts",
    "streaming_dedup",
    "streaming_running_totals",
    "streaming_running_totals_tws",
    "streaming_static_enrich",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_interval_join_full",
    "run_to_memory",
    "streaming_dedup_index_sink",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a parquet directory (schema must be
    explicit for streaming reads)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def streaming_tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling counts with a watermark: state for windows older than
    max(event time) - watermark is finalized and dropped -- bounded state
    at any stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def streaming_distinct_hll(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Approximate distinct users per tumbling window with BOUNDED
    state: the stream aggregates (window, md5-register) -> max rho, so
    state per window is <= 4096 register rows regardless of user
    cardinality -- where a streaming count_distinct would hold EVERY
    key in the state store.  The watermark finalizes and drops windows
    as usual; the register rows drained to the sink ARE the mergeable
    sketch, folded to estimates by one batch pass over the sink
    (streaming disallows chaining a second aggregation without an
    intermediate sink -- and persisting registers is exactly what an
    incremental rollup wants anyway, see s26)."""
    from ..aggregates import hll_reg_sql, hll_rho_sql

    k = "CAST(user_id AS STRING)"
    return (
        events.withWatermark("ts", watermark)
        .selectExpr("ts", f"{hll_reg_sql(k)} AS __reg", f"{hll_rho_sql(k)} AS __rho")
        .groupBy(F.window("ts", width).alias("w"), F.col("__reg"))
        .agg(F.max("__rho").alias("__mj"))
        .select(F.col("w.start").alias("window_start"), "__reg", "__mj")
    )


def streaming_sliding_counts(
    events: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) windows with a watermark: each event lands in
    width/slide windows; state for windows wholly behind the watermark
    is finalized and dropped, same bound as the tumbling form."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def streaming_session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization: native session_window with merging state;
    sessions close (and emit) once the watermark passes their gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """In-flight exact dedup on the event key: state holds one entry per
    key only within the watermark horizon (dropDuplicatesWithinWatermark),
    so state is bounded -- the streaming face of exact_dedup_groups for
    at-least-once sources."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def streaming_running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total, emitted once per trigger.

    The state handle keeps two numbers per user -- the pattern for
    operators Spark lacks natively (per-key accumulators, custom
    sessionization, CDC folding).  Timeout is processing-time based; at
    steady state each micro-batch updates only keys it saw.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_static_enrich(events: DataFrame, dim: DataFrame, on: str = "event_type") -> DataFrame:
    """Stream-static enrichment: each micro-batch joins against the
    static dimension snapshot -- stateless (no watermark needed on the
    join itself), and the dim side broadcasts exactly as in batch.  The
    lookup-table pattern for streams."""
    return events.join(F.broadcast(dim), on, "left")


def streaming_interval_join_outer(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream interval join: clicks keep
    a row even when no same-user purchase follows within `horizon` --
    the "unconverted clicks" side the inner join drops.

    Outer rows can only emit once the watermark proves no match can
    still arrive, so state stays bounded exactly like the inner form;
    the cost is emission latency (a row near end-of-stream whose
    horizon the final watermark never passes is withheld -- which is
    why the gate records this rows-only: the batch-SQL left join has no
    notion of a final watermark).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return clicks.join(
        purchases,
        F.expr(
            f"user_id = p_user_id AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
        "leftOuter",
    ).select("click_id", "user_id", "click_ts", "purchase_ts", "purchase_value")


def streaming_interval_join_full(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """FULL OUTER watermarked stream-stream interval join: unconverted
    clicks AND orphan purchases (no same-user click in the preceding
    `horizon`) both keep a row -- the two-sided audit view of the
    attribution join.  Either side's null row emits only once the
    watermark proves no match can still arrive, so state stays bounded
    exactly like the inner form; rows near end-of-stream whose horizon
    the final watermark never passes are withheld (the oracle emulates
    both emission conditions in batch SQL)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return clicks.join(
        purchases,
        F.expr(
            f"user_id = p_user_id AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
        "fullOuter",
    ).select(
        "click_id",
        F.coalesce(F.col("user_id"), F.col("p_user_id")).alias("user_id"),
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def streaming_interval_join(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: each click pairs with
    the SAME user's purchases within `horizon` after it.

    Both sides carry watermarks and the join predicate bounds event
    time in both directions, so the engine can expire buffered state
    once the watermark passes a row's joinable horizon -- state is
    bounded by (watermark + horizon), not stream length.  The
    attribution-join shape.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return clicks.join(
        purchases,
        F.expr(
            f"user_id = p_user_id AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
    ).select("click_id", "user_id", "click_ts", "purchase_ts", "purchase_value")


def run_to_memory(
    sdf: DataFrame,
    name: str,
    timeout_s: int = 120,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> None:
    """Drain a bounded stream (AvailableNow) into an in-memory table
    `name` -- the test/validation sink.

    state_partitions bounds the stateful shuffle width for the stream's
    lifetime: a streaming query's state-store task count is fixed from
    `spark.sql.shuffle.partitions` at START, and the engine session
    sizes that to the CORE count -- so at fixed stream volume every
    added core adds per-micro-batch state open/commit overhead for
    zero extra work (measured: the interval-join drain ANTI-scaled
    3.2s@8 cores -> 6.1s@32, SCALE.md round-8).  State partitioning
    should track STATE SIZE, not cores; 8 covers the bounded test
    feeds, and a real deployment raises it to its state volume (or
    passes None to inherit the session conf).  The conf is restored
    after the drain -- batch queries in the same session are unaffected
    (drains run sequentially in tests/bench)."""
    conf = sdf.sparkSession.conf
    prev = conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        conf.set("spark.sql.shuffle.partitions", str(int(state_partitions)))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(timeout_s)
        if not finished:
            # a timed-out drain must not keep running after the conf is
            # restored below (it would plan later micro-batches under the
            # session-wide shuffle width) -- stop it and say so
            q.stop()
            raise TimeoutError(
                f"run_to_memory({name!r}): drain did not finish within "
                f"{timeout_s}s; query stopped"
            )
    finally:
        if state_partitions is not None:
            conf.set("spark.sql.shuffle.partitions", prev)


def streaming_upsert_sink(
    sdf: DataFrame,
    path: str,
    keys: Sequence[str],
    order_col: str,
    checkpoint: str,
    timeout_s: int = 120,
) -> None:
    """Streaming CDC apply: foreachBatch folds each micro-batch into
    the parquet target via merge_upsert (keep-latest per key, updates
    win ties) -- readStream -> MERGE, the standard change-capture
    landing pattern.

    foreachBatch gives exactly-once-per-batch semantics against the
    checkpoint; the merge itself is idempotent (re-applying a batch
    yields the same keep-latest result), so crash-replay converges.
    Each micro-batch costs one shuffle on the merge keys.
    """
    from ..io import merge_upsert

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert(batch_df.sparkSession, path, batch_df, keys, order_col)

    q = (
        sdf.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_stop(q, timeout_s, "streaming_upsert_sink")


def _await_or_stop(q, timeout_s: float, what: str) -> None:
    """awaitTermination that treats a timeout as the error it is: stop
    the query and raise, so no caller ever reads a sink that a
    still-live drain keeps mutating (the run_to_memory timed-out-drain
    rule, applied to every foreachBatch sink)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"{what}: drain did not finish within {timeout_s}s; query stopped"
        )


def streaming_running_totals_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running count + value total via transformWithStateInPandas
    -- the Spark 4-native arbitrary-state API (typed state handles, TTL,
    timers) that supersedes applyInPandasWithState.  Functionally the
    twin of streaming_running_totals, kept side by side so the suite
    proves both stateful APIs produce identical results on the same
    bounded input.

    State: one ValueState row (n, total) per user.  At 100 TB-day
    volumes the state store scales with DISTINCT users (RocksDB-backed
    on a real cluster); per micro-batch work touches only the keys the
    batch saw, and TTL (not used here -- totals are lifetime) is the
    knob that bounds abandoned keys.

    Environment gate: the transformWithState Python protocol speaks
    protobuf; when google.protobuf is absent (this container) the
    query's driver worker cannot start, so raise a clear
    NotImplementedError up front instead of a mid-query crash --
    the same import-try discipline as the Excel/Box seams.  The
    applyInPandasWithState twin above is the dependency-free path.
    """
    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(its state-server protocol is protobuf-based); use "
            "streaming_running_totals (applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prev = self._state.get()
            n, total = (prev[0], prev[1]) if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def streaming_dedup_index_sink(
    sdf: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    timeout_s: int = 120,
) -> None:
    """Continuous-ingest corpus dedup: each micro-batch of documents is
    probed against the persisted fingerprint index
    (llm.dedup.dedup_against_index); FRESH documents append to
    `out_path` and their digests fold into the index, duplicates (of
    the index or within the batch) are dropped.  readStream ->
    probe-index -> append + index-merge: the streaming face of
    incremental dedup, so tomorrow's crawl lands deduped without ever
    rescanning yesterday's corpus.

    Exactly-once discipline: foreachBatch replays a failed batch under
    the same batch_id; both effects are idempotent under replay --
    the index fold is a keep-min groupBy (re-folding the same digests
    is a no-op) and the corpus append dedups against the
    already-updated index ... EXCEPT a replay exactly between the two
    writes could re-append rows whose digests already committed.
    Ordering the index fold LAST closes that: a replayed batch re-probes
    the pre-fold index and re-derives the same fresh set, overwriting
    the same append via per-batch output partitioning (batch_id=N dir).
    Per micro-batch cost: two digest-key shuffles, no text shuffles.
    """
    from ..llm.dedup import dedup_against_index

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        tagged = dedup_against_index(batch_df, index_path, id_col, text_col)
        fresh = tagged.filter(F.col("is_new"))
        # 1) land fresh documents in a per-batch directory (replay
        #    overwrites the same dir -- idempotent)
        fresh_ids = fresh.select(F.col("new_id").alias(id_col))
        (
            batch_df.join(F.broadcast(fresh_ids), id_col, "left_semi")
            .write.mode("overwrite")
            .parquet(f"{out_path}/batch_id={batch_id}")
        )
        # 2) THEN fold the fresh digests into the index (keep-min is
        #    idempotent under replay)
        idx = spark.read.parquet(index_path)
        merged = (
            idx.unionByName(
                fresh.select("fingerprint", F.col("new_id").alias("keeper_id"))
            )
            .groupBy("fingerprint")
            .agg(F.min("keeper_id").alias("keeper_id"))
        )
        tmp = index_path.rstrip("/") + ".__idx_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        import os
        import shutil

        swap = index_path.rstrip("/") + ".__idx_old"
        if os.path.exists(swap):
            shutil.rmtree(swap)
        os.rename(index_path, swap)
        os.rename(tmp, index_path)
        shutil.rmtree(swap)

    q = (
        sdf.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_stop(q, timeout_s, "streaming_dedup_index_sink")


def streaming_zonemap_sink(
    sdf: DataFrame,
    path: str,
    cluster_col: str,
    checkpoint: str,
    stat_cols: "Sequence[str] | None" = None,
    files_per_batch: int = 2,
    timeout_s: int = 120,
) -> None:
    """Streaming ingest into a zone-mapped table (layout.py s31): each
    micro-batch lands range-clustered on `cluster_col` under
    DETERMINISTIC batch-keyed file names, then the `_zonemap.json`
    sidecar is refreshed INCREMENTALLY (layout.update_zonemap stats
    only the unmapped files) -- so data skipping holds from the first
    commit and the per-batch maintenance cost is one grouped aggregate
    over the new files, never a table rescan.

    Exactly-once discipline: the batch writes to a staging dir
    (overwrite -- replays re-produce identical content), and the part
    files promote into the table root as `batch<id>-<i>.parquet` via
    os.replace.  A replay is NOT guaranteed to reproduce the same part
    split (repartitionByRange samples boundaries with a
    nondeterministic seed, so a replay can emit fewer non-empty files),
    so promotion also deletes any leftover `batch<id>-*` beyond the new
    set -- otherwise a stale higher-index file would survive as
    duplicate rows -- and the sidecar refresh force-re-stats the
    promoted names, because an overwritten file keeps its name and the
    purely incremental path would trust the old (now wrong) bounds.
    """
    import os
    import shutil

    from ..layout import update_zonemap

    stat_list = list(stat_cols or [cluster_col])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        staging = os.path.join(path, f"_staging_batch_{batch_id}")
        (
            batch_df.repartitionByRange(int(files_per_batch), F.col(cluster_col))
            .write.mode("overwrite")
            .parquet(staging)
        )
        parts = sorted(
            n for n in os.listdir(staging) if n.endswith(".parquet")
        )
        os.makedirs(path, exist_ok=True)
        promoted = []
        for i, n in enumerate(parts):
            dst = f"batch{batch_id}-{i}.parquet"
            os.replace(os.path.join(staging, n), os.path.join(path, dst))
            promoted.append(dst)
        shutil.rmtree(staging)
        keep = set(promoted)
        for n in os.listdir(path):
            if (
                n.startswith(f"batch{batch_id}-")
                and n.endswith(".parquet")
                and n not in keep
            ):
                os.remove(os.path.join(path, n))
        update_zonemap(spark, path, stat_list, refresh=promoted)

    q = (
        sdf.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_stop(q, timeout_s, "streaming_zonemap_sink")


def topk_finish(agg: DataFrame, k: int = 3) -> DataFrame:
    """Finish a drained streaming (window, key, count) sink into the
    per-window top-k -- the streaming-top-k split: the STREAM maintains
    bounded per-(window, key) counts under the watermark (state is
    windows x keys, never events), and the rank runs at sink-read time
    because Structured Streaming disallows chaining a window function
    after a streaming aggregation (same drain-then-finish shape as
    streaming_distinct_hll -> hll_md5_estimate).  Deterministic:
    count DESC, key ASC tie-break."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select("window_start", "event_type", "n_events", "rank")
    )

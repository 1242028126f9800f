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

"""Streaming layer tests: windowed aggregation equals its batch
counterpart; the custom stateful operator maintains correct per-key
state across the drained stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from snackfs_spark.streaming.ingest import (
    hourly_rollup_stream,
    run_stream_to_df,
    session_window_stream,
)
from snackfs_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_hourly_rollup_stream_equals_batch(spark):
    got = run_stream_to_df(spark, hourly_rollup_stream(spark, SF_SMALL))
    ev = load_table(spark, SF_SMALL, "events")
    want = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_windows_complete(spark):
    got = run_stream_to_df(spark, session_window_stream(spark, SF_SMALL))
    ev = load_table(spark, SF_SMALL, "events")
    # every event lands in exactly one session window
    assert got.agg(F.sum("n_events")).collect()[0][0] == ev.count()


def test_stateful_user_monitor(spark):
    from snackfs_spark.streaming.stateful import user_monitor_stream

    got = run_stream_to_df(spark, user_monitor_stream(spark, SF_SMALL), mode="update")
    # update mode: keep the final row per user
    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
    )
    ev = load_table(spark, SF_SMALL, "events")
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value")
    )
    got_map = {r["user_id"]: (r["n_events"], r["max_value"]) for r in final.collect()}
    want_map = {r["user_id"]: (r["n_events"], r["max_value"]) for r in want.collect()}
    assert got_map == want_map

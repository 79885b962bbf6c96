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


def test_stream_stream_join_equals_batch(spark):
    from snackfs_spark.streaming.ingest import purchase_error_join_stream

    got = run_stream_to_df(
        spark, purchase_error_join_stream(spark, SF_SMALL), mode="append"
    )
    ev = load_table(spark, SF_SMALL, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    er = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("error_value"),
    )
    want = p.join(
        er,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("e_ts") <= F.col("p_ts")),
    ).select("purchase_id", "p_user", "p_ts", "error_id", "e_ts", "error_value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_incremental_microbatches_converge_to_batch(spark):
    """True incremental execution: stream the multi-file ingest layout
    one file per trigger, so the windowed aggregation is computed across
    SEVERAL micro-batches with state carried between them — and the
    drained result must still equal the batch plan."""
    import glob

    from snackfs_spark.sources import tables
    from tests.conftest import SF_ORACLE

    root = tables.build_ingest_cache(spark, SF_ORACLE, split_bytes=64 * 1024)
    tables._INGEST_CACHE.pop(SF_ORACLE, None)  # batch side reads raw
    ev_dir = f"{root}/events.parquet"
    n_files = len(glob.glob(f"{ev_dir}/part-*"))
    assert n_files > 1, "need multiple files for multiple micro-batches"
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("hour_start"), "event_type", "n_events")
    )
    got = run_stream_to_df(spark, stream)
    ev = load_table(spark, SF_ORACLE, "events")
    want = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

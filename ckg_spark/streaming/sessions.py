"""Sessionization — a custom stateful streaming operator
(``applyInPandasWithState``) with an exactly-equivalent batch twin.

A session = a maximal run of one user's events with inter-event gaps below
``gap_seconds``. The reference has no streaming at all (SURVEY.md §2.9);
this is the "custom stateful operator" capability of the build brief,
shaped like the per-user state machines a training-data pipeline needs
(session windows do not fit Spark's built-in tumbling/sliding windows —
their end depends on the data).

Two implementations, one semantics:

- ``batch_sessions``: lag + running-sum-of-breaks window math (pure SQL —
  this is the DuckDB-oracle-checkable path, catalog q_event_sessions);
- ``streaming_sessions``: per-user state (current session's start, last
  ts, counts) held in ``applyInPandasWithState`` with an event-time
  timeout. A session is EMITTED when it is provably closed: either a
  newer event of the same user arrives past the gap, or the watermark
  passes last_ts + gap (timeout). Until then it stays in state — so a
  drained ``Trigger.AvailableNow`` run emits exactly the sessions a batch
  run over the same data would close, which the tests assert.

State size is O(active users), bounded by the watermark-driven timeout —
the property that makes this safe on an unbounded 100 TB event stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)


def batch_sessions(events: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """Closed AND open sessions of a bounded table, via window math."""
    from pyspark.sql.window import Window

    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_break = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > gap_seconds
    )
    marked = e.withColumn(
        "session_no",
        F.sum(F.when(gap_break, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .drop("session_no")
    )


def streaming_sessions(
    events: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Stateful sessionizer for a streaming DataFrame; emits closed
    sessions only (append semantics)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def proc(key, pdfs, state: GroupState):
        (user_id,) = key
        out = []

        def close(start_us, last_us, n, total):
            out.append(
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(last_us, unit="us"),
                    "n_events": int(n),
                    "total_value": round(float(total), 6),
                }
            )

        if state.hasTimedOut:
            if state.exists:
                close(*state.get)
                state.remove()
            yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])
            return

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = None, None, 0, 0.0
        for ts, value in zip(rows["ts"], rows["value"]):
            t_us = int(pd.Timestamp(ts).value // 1_000)
            if last_us is None:
                start_us, last_us, n, total = t_us, t_us, 1, float(value)
            elif t_us - last_us > gap_us:
                close(start_us, last_us, n, total)
                start_us, last_us, n, total = t_us, t_us, 1, float(value)
            else:
                last_us = max(last_us, t_us)
                n += 1
                total += float(value)
        state.update((start_us, last_us, n, total))
        state.setTimeoutTimestamp((last_us + gap_us) // 1_000)
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])

    e = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return e.groupBy("user_id").applyInPandasWithState(
        proc,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )

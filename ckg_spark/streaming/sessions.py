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
- ``streaming_sessions``: per-user state holds ALL not-yet-closed
  sessions (late, out-of-order events inside the watermark may extend,
  prepend to, or BRIDGE existing sessions, so a single current-session
  state would be wrong). A session is EMITTED only when the watermark
  passes last_ts + gap — at that point no admissible event can still
  join it (later-arriving data below the watermark is dropped by Spark).
  A drained ``Trigger.AvailableNow`` run therefore emits exactly the
  sessions a batch run over the same data closes, which the tests assert
  including an out-of-order bridging case.

State size is O(active users), bounded by the watermark-driven timeout —
the property that makes this safe on an unbounded 100 TB event stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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

# state holds ALL of a user's not-yet-closed sessions (parallel arrays,
# sorted by start): late out-of-order events within the watermark may
# extend, prepend to, or BRIDGE existing sessions, so emission must wait
# for the watermark, not for the next arrival
_STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("lasts_us", ArrayType(LongType())),
        StructField("ns", ArrayType(IntegerType())),
        StructField("totals", ArrayType(DoubleType())),
    ]
)


def batch_sessions(events: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """Closed AND open sessions of a bounded table, via window math."""
    from pyspark.sql.window import Window

    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond arithmetic, matching streaming_sessions exactly — a
    # second-truncated cast('long') would split/merge sub-second gaps
    # differently than the stateful operator
    gap_us = gap_seconds * 1_000_000
    gap_break = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w) > gap_us
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

        # sessions: sorted-by-start list of [start_us, last_us, n, total]
        if state.exists:
            starts, lasts, ns, totals = state.get
            sessions = [list(t) for t in zip(starts, lasts, ns, totals)]
        else:
            sessions = []

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            for ts, value in zip(rows["ts"], rows["value"]):
                t_us = int(pd.Timestamp(ts).value // 1_000)
                # merge the event into the session list: join any session
                # within gap on either side; a joining event may BRIDGE two
                joined = None
                for s in sessions:
                    if s[0] - gap_us <= t_us <= s[1] + gap_us:
                        s[0] = min(s[0], t_us)
                        s[1] = max(s[1], t_us)
                        s[2] += 1
                        s[3] += float(value)
                        joined = s
                        break
                if joined is None:
                    sessions.append([t_us, t_us, 1, float(value)])
                    sessions.sort(key=lambda s: s[0])
                else:
                    # bridging: the extended session may now touch a neighbor
                    sessions.sort(key=lambda s: s[0])
                    merged = [sessions[0]]
                    for s in sessions[1:]:
                        prev = merged[-1]
                        if s[0] - prev[1] <= gap_us:
                            prev[1] = max(prev[1], s[1])
                            prev[2] += s[2]
                            prev[3] += s[3]
                        else:
                            merged.append(s)
                    sessions = merged

        # emit everything the watermark has finalized (no same-user event
        # can join a session once watermark > last + gap, because later
        # arrivals below the watermark are dropped by Spark)
        wm_us = state.getCurrentWatermarkMs() * 1_000
        still_open = []
        for s in sessions:
            if wm_us > 0 and s[1] + gap_us < wm_us:
                close(*s)
            else:
                still_open.append(s)

        if still_open:
            state.update(
                (
                    [s[0] for s in still_open],
                    [s[1] for s in still_open],
                    [s[2] for s in still_open],
                    [s[3] for s in still_open],
                )
            )
            state.setTimeoutTimestamp(min(s[1] for s in still_open) // 1_000 + gap_seconds * 1_000)
        elif state.exists:
            state.remove()
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

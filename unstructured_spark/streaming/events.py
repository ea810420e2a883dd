"""Streaming event analytics: watermarked windowed aggregation and a
custom stateful sessionizer (SURVEY §2.10 streaming row: "watermarks +
windowed aggs for late data; applyInPandasWithState for custom
stateful operators").

These operate on an event stream with (ts timestamp, user_id, value):
the batch twins live in the driver contract (q_events_daily,
q_events_sessionize); the streaming forms handle unbounded input with
bounded state — the watermark ages out window state, and the
sessionizer's processing-time timeout flushes idle sessions.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_STATE_SCHEMA = "start timestamp, end timestamp, n bigint, total double"


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark: late events inside
    the watermark still update their window; older state is dropped
    (bounded state on an unbounded stream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Custom stateful session windows via ``applyInPandasWithState``:
    per-user running session carried in GroupState; a new event beyond
    ``gap_seconds`` closes the open session and starts a new one; the
    processing-time timeout flushes sessions with no traffic.

    This is the operator Structured Streaming's built-in windows can't
    express (data-driven window boundaries)."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, end, n, total = state.get
                rows.append((user_id, start, end, n, float(total), True))
                state.remove()
        else:
            events_pdf = pd.concat(list(pdfs)).sort_values("ts")
            if state.exists:
                start, end, n, total = state.get
            else:
                start = end = None
                n, total = 0, 0.0
            for ev in events_pdf.itertuples(index=False):
                ts = ev.ts
                if start is not None and (ts - end).total_seconds() > gap_seconds:
                    rows.append((user_id, start, end, n, float(total), True))
                    start = end = None
                    n, total = 0, 0.0
                if start is None:
                    start = ts
                end = ts
                n += 1
                total += float(ev.value)
            state.update((start, end, n, float(total)))
            state.setTimeoutDuration(idle_timeout_ms)
            # also emit the open session's running shape (closed=False)
            rows.append((user_id, start, end, n, float(total), False))
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "total_value", "closed",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

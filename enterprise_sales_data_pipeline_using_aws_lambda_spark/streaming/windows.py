"""Streaming windowed aggregates & stream dedup — the event-time
extension surface the reference lacks entirely (SURVEY §2.8: no
watermarks, no tumbling/sliding/session windows, no stateful ops).

All builders take a (possibly streaming) events DataFrame with columns
``(event_id, ts, user_id, event_type, value)`` and return a lazily
planned DataFrame usable under ``writeStream`` — the same logical plans
also run in batch mode (tested both ways; the batch face of the daily
tumbling window is the oracle-checked ``event_daily_agg`` query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Late-data bound: state for windows older than max(ts) - delay is
    evicted; later rows are dropped (documented late policy)."""
    return events.withWatermark("ts", delay)


def tumbling_counts(
    events: DataFrame, width: str = "1 day", slide: str | None = None
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) window aggregate
    per event_type: count + sum(value).

    In streaming mode Spark keeps one state row per (window, type);
    partial aggregation happens map-side exactly as in batch."""
    w = (
        F.window("ts", width, slide)
        if slide
        else F.window("ts", width)
    )
    return events.groupBy(w.alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (built-in ``session_window`` — no custom state op
    needed)."""
    return events.groupBy(
        F.session_window("ts", gap).alias("win"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        "user_id",
        "n_events",
        "total_value",
    )


def stream_dedup(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """In-stream exactly-once-per-key dedup: ``dropDuplicates`` on the
    key with a watermark bounding the dedup state (reference A2's
    streaming face — SURVEY §2.5)."""
    return with_watermark(events, delay).dropDuplicates(["event_id"])

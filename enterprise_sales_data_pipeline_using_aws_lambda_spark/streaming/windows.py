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


def _event_time(df: DataFrame, col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); parquet files written without
    a timezone annotation surface as TIMESTAMP_NTZ under default configs.
    The session is pinned to UTC, so the cast is value-identical."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Late-data bound: state for windows older than max(ts) - delay is
    evicted; later rows are dropped (documented late policy)."""
    return _event_time(events, "ts").withWatermark("ts", delay)


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
    """In-stream exactly-once-per-key dedup: ``dropDuplicates`` on
    (key, event time) with a watermark bounding the dedup state
    (reference A2's streaming face — SURVEY §2.5).

    The event-time column MUST be part of the dedup key: Spark evicts
    ``dropDuplicates`` state on watermark expiry only when the subset
    contains the watermark column — keying on ``event_id`` alone would
    keep one state row per key forever (unbounded state on a
    high-cardinality stream).  Consequence: retransmissions with a
    jittered timestamp are distinct here; use
    :func:`stream_dedup_within_watermark` for those."""
    return with_watermark(events, delay).dropDuplicates(["event_id", "ts"])


def stream_dedup_within_watermark(
    events: DataFrame, delay: str = "1 hour"
) -> DataFrame:
    """Duplicate suppression with BOUNDED state even when duplicates
    carry different event times: ``dropDuplicatesWithinWatermark``
    deduplicates keys whose arrivals land within the watermark delay of
    each other, then evicts the key's state once the watermark passes.

    Contrast with :func:`stream_dedup` (plain ``dropDuplicates`` under a
    watermark): that variant keys state on (event_id, exact ts), so a
    retransmission with a slightly different timestamp — the common
    at-least-once-producer case — is NOT collapsed.  This variant
    collapses any duplicates separated by less than ``delay``, which is
    the semantics an ingest dedup actually wants, with the same O(keys
    in window) state bound."""
    return _event_time(events, "ts").withWatermark(
        "ts", delay
    ).dropDuplicatesWithinWatermark(["event_id"])


def sliding_counts(
    events: DataFrame,
    width: str = "60 minutes",
    slide: str = "30 minutes",
    delay: str = "1 hour",
) -> DataFrame:
    """Sliding event-time windows (width/slide overlapping panes) under a
    watermark — each event feeds width/slide panes, expanded before the
    partial agg so the shuffle carries per-(pane, partition) partials.
    Batch face: plans/queries.sliding_window_event_rate (same operator,
    no watermark)."""
    return (
        with_watermark(events, delay)
        .groupBy(F.window("ts", width, slide).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def stream_stream_click_purchase(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    delay: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: every (click, purchase) pair for the
    same user where the purchase lands within ``horizon`` after the
    click.

    Both sides carry watermarks and the join condition bounds purchase
    time relative to click time, so Spark can size the join state: a
    buffered click is dropped once the purchase-side watermark passes
    ``click.ts + horizon``; neither side's state grows unboundedly.
    Without the time bound the state store would have to keep every row
    forever — the classic unbounded-state trap.

    Input frames must carry (user_id, ts, ...) and may be the same
    source filtered two ways."""
    c = _event_time(clicks, "ts").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", delay)
    p = _event_time(purchases, "ts").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", delay)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )

"""Event-time windowed aggregation with watermarking.

The reference has no time windows (SURVEY §2.9 — its only window is
the 50-row W1 frame), but an engine ingesting event streams at scale
needs tumbling/sliding event-time aggregates with bounded state; this
is the standard Structured Streaming formulation: watermark bounds
how late data may arrive, window buckets by event time, and the same
expression runs identically in batch (watermark ignored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time counts + value sums per
    event_type.

    Works on both batch and streaming DataFrames: on a stream the
    watermark bounds state (windows older than max(event time) −
    watermark are finalized and dropped); in batch Spark ignores the
    watermark and computes every window.  Window starts align to the
    epoch, matching SQL ``time_bucket`` semantics.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    return (
        df.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session windows: events of one key closer than ``gap`` merge
    into one session (Spark ``session_window``; batch and streaming).

    Session start = first event; per-session count and value sum.  The
    batch form is oracle-expressible as the classic gaps-and-islands
    SQL (lag → new-session flag → cumulative session id), which is
    exactly how q40's DuckDB twin verifies it.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(win, key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )

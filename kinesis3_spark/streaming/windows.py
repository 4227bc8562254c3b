"""Event-time windowed aggregations (SURVEY.md §2b rows 41-43).

All three shapes take a (possibly streaming) DataFrame with an event-time
`ts` column and return the aggregated plan; watermarks bound state so the
same code runs unbounded. Output columns are hash-stable (window starts
formatted to strings, sums rounded, counts bigint).

Scale notes: windowed aggregation shuffles on (window, key) — partial
aggregation happens map-side, and watermark eviction keeps state
O(active windows x keys), not O(stream length). Skewed keys inside a
window are the one hazard; AQE handles the batch re-run, salting the key
is the streaming fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_counts(
    df: DataFrame, width: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Non-overlapping event-time buckets: count + value sum per
    (window, event_type)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", _FMT).alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_value_stats(
    df: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows (each event lands in width/slide windows)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.date_format("w.start", _FMT).alias("win_start"), "n", "total_value")
    )


def session_counts(
    df: DataFrame, gap: str = "10 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user session windows: a session extends while consecutive events
    arrive within `gap`; the window closes `gap` after the last event
    (Spark session_window == gaps-and-islands in batch SQL)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            F.date_format("w.end", _FMT).alias("session_end"),
            "n_events",
        )
    )

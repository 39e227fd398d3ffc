"""Streaming windows/watermarks/stateful ops over an event stream —
the green-field surface (SURVEY.md §2.5 note: the reference has no
watermarks, windows, or state).

Each builder takes a *streaming* DataFrame (spark.readStream...) and
returns the windowed aggregation; tests drive them with a file source
+ Trigger.AvailableNow into a memory sink.  The same expressions run
in batch (plans/streaming_queries.py) — that equivalence is the
correctness argument for the streaming forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _eventtime(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local tz); NTZ event times
    are cast (identity under the engine's pinned UTC session)."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count/sum by event_type with late-data bound."""
    events = _eventtime(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    events = _eventtime(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful session windows (gap-merged) per user."""
    events = _eventtime(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Keyed streaming dedup with bounded state
    (dropDuplicatesWithinWatermark — state is purged past the
    watermark, so memory is bounded at any scale)."""
    events = _eventtime(events, ts_col)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INTERVAL join: each left event matches right
    events of the same key landing in (left_ts, left_ts + max_gap].

    Both sides carry watermarks, and the time-range condition bounds
    the join state Spark must retain (rows older than
    watermark + max_gap are purged) — the canonical
    attribution/conversion join that runs with bounded memory on an
    unbounded stream.  Columns: (key, left_id, left_ts, right_id,
    right_ts)."""
    l = (
        _eventtime(left, ts_col)
        .select(
            F.col(key),
            F.col(id_col).alias("left_id"),
            F.col(ts_col).alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    r = (
        _eventtime(right, ts_col)
        .select(
            F.col(key).alias("_rk"),
            F.col(id_col).alias("right_id"),
            F.col(ts_col).alias("right_ts"),
        )
        .withWatermark("right_ts", watermark)
    )
    return l.join(
        r,
        (F.col(key) == F.col("_rk"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).drop("_rk")

"""Windowed streaming aggregations over event streams.

The reference has no streaming surface; this extends the engine to the
standard Structured Streaming shapes a training-data/analytics pipeline
needs: watermarked tumbling/sliding window aggregation and stateful
sessionization. Batch DataFrames run through the same functions (Spark's
unified API), which is how the DuckDB oracles check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """(window_start, window_end, event_type, n, sum_value) tumbling/sliding
    window counts. On a streaming DataFrame the watermark bounds state and
    admits late events up to the delay; on a batch frame it is a no-op."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events) via session windows
    (gap-based). Streaming: F.session_window with watermark-bounded state.
    Batch: same expression works without the watermark."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(F.col(user_col), sw.alias("s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )

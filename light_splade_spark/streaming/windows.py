"""Watermarked tumbling-window aggregation over an event stream.

The Structured Streaming shape for late-data-tolerant rollups: a
``withWatermark`` bound lets the state store evict closed windows (state
is bounded by windows-in-flight, not stream length), and append mode
emits each (window, key) row exactly once — when the watermark passes the
window end. Spark's no-data micro-batch (on by default) finalizes the
last windows after an AvailableNow drain once the watermark has advanced
past them.

Scale shape: the groupBy(window, key) is the standard keyed-state
exchange; state per (window, key) is one count + one sum, evicted at
watermark, so a year-long stream holds only ``windows_in_flight x keys``
state regardless of total events. The reference has no streaming; this is
the idiomatic Spark answer to its batch eval-time aggregations for a
continuously arriving corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(stream: DataFrame, window: str = "1 hour",
                          watermark: str = "30 minutes",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """-> streaming DataFrame(w_start, w_end, <key>, n_events, sum_value):
    tumbling ``window`` counts + value sums per key, tolerating events up
    to ``watermark`` late. Epoch-aligned windows (Spark default), so the
    batch-SQL mirror is ``time_bucket``."""
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), key_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"),
                    key_col, "n_events", "sum_value"))


def stream_windowed_counts(stream: DataFrame, output_dir: str,
                           checkpoint_dir: str, window: str = "1 hour",
                           watermark: str = "30 minutes"):
    """Start an AvailableNow append-mode query writing closed windows to
    parquet. Only windows the watermark has passed are emitted — callers
    that need EVERY window flushed append a later-timestamped sentinel
    event (and filter it from results), the standard finalization trick
    for finite replays of an infinite-stream operator."""
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    return (agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())

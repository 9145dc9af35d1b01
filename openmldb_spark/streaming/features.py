"""Streaming feature views — beyond the reference (which is batch+online
request only, SURVEY.md §2.8), these give the same feature definitions a
low-latency path using Structured Streaming primitives:

- ``streaming_window_counts`` — tumbling/sliding event-time windowed
  aggregates with watermarked late-data handling; the streaming twin of
  ``window_agg``'s time-range frames (frames are per-window here, not
  per-row: per-row backward frames need the request path / batch
  backfill).
- ``streaming_sessions`` — native ``session_window`` gap sessions; the
  streaming twin of ``sessionize``.

Both return unstarted DataFrames; bind them to a sink with
``writeStream`` (tests use the memory sink + processAllAvailable).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_window_counts(stream_df: DataFrame, keys: Sequence[str],
                            ts_col: str = "ts",
                            window: str = "5 minutes",
                            slide: str | None = None,
                            watermark: str = "10 minutes",
                            value_col: str | None = None) -> DataFrame:
    """Watermarked tumbling (or sliding) windowed count/sum per key."""
    w = F.window(F.col(ts_col), window, slide) if slide else \
        F.window(F.col(ts_col), window)
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_v"))
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(w.alias("win"), *keys)
            .agg(*aggs)
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"), *keys,
                    *[F.col(a) for a in
                      (["n", "sum_v"] if value_col else ["n"])]))


def streaming_sessions(stream_df: DataFrame, keys: Sequence[str],
                       ts_col: str = "ts", gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions via native ``session_window`` — one output row
    per closed session with its span and event count."""
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"),
                     *keys)
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"),
                    *keys, "n_events"))

"""Streaming windowed aggregation with event-time watermarks.

The batch analog is ``operators.events.tumbling_counts``; this is the
same logical aggregation under Structured Streaming semantics: an
event-time watermark bounds aggregation state and defines the late-data
cutoff — records older than (max event time seen - delay) are dropped,
everything newer updates its window exactly once in append mode when
the watermark passes the window end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "log_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key tumbling-window counts over an event stream.

    Append-mode compatible: a window emits once, when the watermark
    passes its end. State per open window is one row per (window, key).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n_events"),
        )
    )


def streaming_session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key session windows via the Catalyst-native
    ``session_window`` (dynamic-length windows that close when the key
    goes quiet for ``gap``). A session emits once, when the watermark
    passes its end; open-session state is one row per active (key,
    session). The custom-logic sibling (per-session payloads, custom
    merge) is ``sessions.streaming_sessionize``
    (applyInPandasWithState); this is the declarative fast path."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            F.col("n_events"),
        )
    )

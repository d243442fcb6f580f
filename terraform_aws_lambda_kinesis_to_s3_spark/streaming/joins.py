"""Streaming joins: stream-stream interval join and stream-static enrich.

Structured Streaming's stream-stream join buffers both sides in state;
without time bounds that state grows forever. The interval join here is
the bounded form: both sides carry an event-time watermark and the join
predicate constrains ``right.ts`` to a window after ``left.ts``, so the
engine can evict state as the watermark advances — the 100 TB/day
correlation-join pattern (impression->click, request->response,
order->shipment) with O(window) state instead of O(stream).

The stream-static enrich is the other join a routed pipeline needs:
each micro-batch broadcast-joins a slowly-changing dimension snapshot;
no streaming state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands in
    ``[left.ts, left.ts + within]``.

    Both inputs must be streaming DataFrames with event-time columns.
    Column names are disambiguated with ``l_``/``r_`` prefixes (except
    the shared join key). Outer variants emit the unmatched side only
    once the watermark proves no match can arrive.
    """
    l_w = left.withWatermark(left_ts, watermark)
    r_w = right.withWatermark(right_ts, watermark)
    l_p = l_w.select(
        F.col(key), *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key]
    )
    r_p = r_w.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    cond = (
        (l_p[key] == r_p["__rkey"])
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return l_p.join(r_p, cond, how).drop("__rkey")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension via per-batch broadcast
    join — the dim is re-resolved each micro-batch, carries no
    streaming state, and never blocks the watermark."""
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], how
    ).drop(dim_key)

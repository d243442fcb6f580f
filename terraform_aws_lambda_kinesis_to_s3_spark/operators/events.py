"""Event-stream analytics operators (Tier B over the ``events`` table).

Operators a log-analytics user of the reference pipeline would run on
the routed output: gap-based sessionization, tumbling-window
aggregation, and a backward as-of join — the classic operator Spark
has no builtin for, expressed as a union + window ``last(ignorenulls)``
(one sort-based shuffle on the join key, no range-explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``. Adds ``session_id``
    (user-scoped ordinal). Single shuffle: partitionBy(user)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    hours: int = 1,
) -> DataFrame:
    """Tumbling-window count/sum per key (batch analog of the streaming
    windowed agg; streaming variant in ``streaming.job``)."""
    win = F.window(F.col(ts_col), f"{hours} hour")
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` for the same key.

    Union-and-carry-forward plan: tag both sides, sort within key by
    (ts, side) — right rows sort before simultaneous left rows — and
    carry the right payload forward with ``last(ignorenulls=True)``.
    One shuffle on the key; no range join, no explosion; this is how
    you do 100 TB as-of joins without an interval index.
    """
    rc = list(right_cols)
    l_t = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in rc
        ],
    )
    r_t = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in rc],
    )
    for c in left.columns:
        if c not in (on, ts_col):
            r_t = r_t.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_t.unionByName(r_t)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
            for c in rc
        ],
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .drop("__is_left", *[f"__r_{c}" for c in rc])
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the *earliest* right row
    with ``right.ts >= left.ts`` for the same key; optional tolerance
    nulls matches further than ``tolerance_seconds`` ahead.

    Same union + window plan as the backward variant, carried with
    ``first(ignorenulls)`` over the *following* frame. One shuffle on
    the key.
    """
    rc = list(right_cols)
    marker = "__r_ts"
    l_t = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("timestamp").alias(marker),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in rc
        ],
    )
    r_t = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        F.col(ts_col).alias(marker),
        *[F.col(c).alias(f"__r_{c}") for c in rc],
    )
    for c in left.columns:
        if c not in (on, ts_col):
            r_t = r_t.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_t.unionByName(r_t)
    # right rows sort after simultaneous left rows (is_left desc) so a
    # right row at the same ts is eligible (>=)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.first(marker, ignorenulls=True).over(w).alias("r_ts"),
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
            for c in rc
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).drop(
        "__is_left", marker, *[f"__r_{c}" for c in rc]
    )
    if tolerance_seconds is not None:
        lag_ok = (
            F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col(ts_col))
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            *[c for c in out.columns if not c.startswith("r_")],
            *[
                F.when(lag_ok, F.col(f"r_{c}")).alias(f"r_{c}")
                for c in ["ts", *rc]
            ],
        )
    return out

"""Custom stateful streaming operator: gap-based sessionization.

Spark has no built-in gap-session operator for arbitrary aggregation
shapes, so this is the ``applyInPandasWithState`` pattern (SURVEY.md
§1.4): per-key state holds the open session; a batch's events merge
into it; sessions whose gap closed are emitted; a processing-time
timeout flushes sessions that stop receiving events.

State per user is O(1) (open-session bounds + count), so state size
scales with |active users|, not |events| — the property that matters
at 100 TB/day event volumes.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def make_session_fn(gap_minutes: int = 30, timeout_ms: int | None = 60_000):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, end_us, n)

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((s, e, n))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(v.value // 1000) for v in pd.to_datetime(pdf["ts"])
                )
            ts_us.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = None, None, 0
            for t in ts_us:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            if start is not None:
                state.update((start, last, n))
                if timeout_ms:
                    state.setTimeoutDuration(timeout_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    timeout_ms: int | None = 60_000,
) -> DataFrame:
    """Emit closed sessions from a stream of (user, ts) events.

    Sessions close either when a later event exceeds the gap, or when
    the processing-time timeout flushes an idle open session
    (``timeout_ms=None`` disables the flush — open sessions then stay
    in state until a closing event arrives; note an availableNow drain
    keeps cycling micro-batches while timeouts are pending, so
    batch-replay tests want None).
    """
    df = events.selectExpr(f"{user_col} as user_id", f"{ts_col} as ts")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms else GroupStateTimeout.NoTimeout
    )
    return df.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_minutes, timeout_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )

"""Arbitrary stateful streaming via Spark 4's transformWithState API.

``running_user_counts`` maintains a per-user event counter in keyed
ValueState — the transformWithStateInPandas successor to
``applyInPandasWithState`` (streaming/sessions.py uses the latter; both
surfaces are part of the engine's stateful contract). State lives in
the checkpointed state store: O(1) per key, survives restarts, and each
micro-batch emits the key's REVISED total (update semantics).

Runtime dependency: the transformWithState worker protocol requires
``protobuf`` on driver and executors (absent in this container — the
test skips itself there; ``streaming/sessions.py`` covers the stateful
contract with applyInPandasWithState, which has no such dependency).

At 100 TB of events the state size is bounded by |distinct users|, not
by throughput — the same argument as the sessionizer's. A TTL config
would bound it further for churning key spaces; the test pins the
restart-survival behavior, which is the property that matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

COUNT_SCHEMA = StructType([StructField("n", LongType())])
OUTPUT_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("n_events", LongType())]
)


class RunningCountProcessor(StatefulProcessor):
    """Per-key running count in ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cnt = handle.getValueState("cnt", COUNT_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        total = self._cnt.get()[0] if self._cnt.exists() else 0
        for pdf in rows:
            total += len(pdf)
        self._cnt.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    def close(self) -> None:
        pass


def running_user_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming per-user running event counts (update semantics)."""
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningCountProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

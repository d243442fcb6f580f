"""Per-batch pipeline metrics — A12 observability parity.

The reference brackets its decode/parse loop in an X-Ray ``parse``
subsegment (``/root/reference/lambda/main.py:15-17,46,65``) so every
Lambda invocation reports how many records it parsed and saved. The
Spark-native equivalent costs one ``observe()`` on the routed stream
(aggregates computed inside the existing job, no extra pass) plus a
``StreamingQueryListener`` that surfaces the per-micro-batch numbers:
records in, valid, routed-to-unknown.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from terraform_aws_lambda_kinesis_to_s3_spark.config import PipelineConfig

OBSERVATION_NAME = "route_metrics"


def observe_routes(routed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Attach the per-batch observation to a routed stream.

    ``observe`` rides on the batch's own execution — the counters are
    computed as accumulator-style aggregates during the write, not as
    a second query over the source.
    """
    unknown = F.lit(cfg.log_type_unknown_prefix)
    return routed.observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.when(F.col("route") == unknown, 1).otherwise(0)).alias("n_unknown"),
        F.sum(F.when(F.col("valid"), 1).otherwise(0)).alias("n_valid"),
    )


class RouteMetricsListener(StreamingQueryListener):
    """Collects ``route_metrics`` observation rows per micro-batch.

    Listener callbacks arrive on a delivery thread; ``wait_for`` lets
    tests (and drain-style jobs) block until the expected number of
    batches reported.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._event = threading.Event()
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        metrics = event.progress.observedMetrics.get(OBSERVATION_NAME)
        if metrics is not None:
            with self._lock:
                self.batches.append(
                    {"batch_id": event.progress.batchId, **metrics.asDict()}
                )
                self._event.set()

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def totals(self) -> dict[str, int]:
        """Summed counters across all observed batches."""
        with self._lock:
            out = {"n_in": 0, "n_unknown": 0, "n_valid": 0, "n_batches": 0}
            for b in self.batches:
                out["n_batches"] += 1
                for k in ("n_in", "n_unknown", "n_valid"):
                    out[k] += int(b.get(k) or 0)
            return out

    def wait_for(self, n_batches: int = 1, timeout: float = 30.0) -> bool:
        """Block until >= n_batches observation rows arrived."""
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                if len(self.batches) >= n_batches:
                    return True
                self._event.clear()
            self._event.wait(min(0.5, max(0.0, deadline - time.monotonic())))
        with self._lock:
            return len(self.batches) >= n_batches

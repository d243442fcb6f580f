"""Streaming distinct-count monitor: a HyperLogLog sketch maintained
incrementally over a micro-batch stream — the streaming counterpart of
the batch ``hll_distinct_users`` query, for the feed where "how many
distinct users have we EVER seen" must be answerable after every batch
without ever storing the distinct set itself.

Dataflow per micro-batch (foreachBatch):

    batch ── (register, max rank) partial ──> registers/run=<t>/batch=N
                                  │
                                  └─ read all partials ─ max-merge ─
                                     estimate ─ append to metrics

State contract — one rung ABOVE the ladder in streaming/drift.py:

- per-batch partial registers land under ``run=<token>/batch=N``; a
  same-run retried batch OVERWRITES its own partial (exactly-once for
  the common at-least-once retry), same as the census pattern;
- a replay from a fresh checkpoint appends a second copy of every
  partial — and the estimate is UNCHANGED, exactly.  Registers merge
  by max, and max is idempotent: duplicate partials are absorbed, so
  the monitor gives exactly-once-equivalent answers under at-least-once
  delivery with NO distinct-tracking state.  (The drift monitor only
  gets scale-INVARIANCE of a ratio; counts themselves double.  The
  ingest path needs a history anti-join.  The sketch needs nothing.)
- state size is O(256) per run regardless of stream length — the
  1000-executor story and the laptop story are the same plan: partial
  registers per partition, one bounded max-merge.

The estimate math is ``operators.sketches.hll_estimate_from_registers``
— the identical exact-integer combine the batch query and its DuckDB
oracle compute, so the streaming readout is pinned by the same
cross-engine contract as the batch one (parity test:
tests/test_streaming_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_register_rank,
)
from terraform_aws_lambda_kinesis_to_s3_spark.streaming.ingest import (
    _hadoop_path_exists,
    _run_token,
)


def hll_partial(batch_df: DataFrame, id_col: str = "user_id") -> DataFrame:
    """Map a micro-batch to its (``__reg``, ``__mrank``) partial
    register table (≤256 rows) — the map-side combine of the sketch."""
    reg, rank = hll_register_rank(F.col(id_col))
    return (
        batch_df.select(reg.alias("__reg"), rank.alias("__rank"))
        .groupBy("__reg")
        .agg(F.max("__rank").alias("__mrank"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """1-row (n_registers_set, hll_est) from any pile of partial
    register tables — duplicates and replays absorbed by the max-merge
    inside the shared combine."""
    merged = registers.groupBy("__reg").agg(F.max("__mrank").alias("__mrank"))
    est = hll_estimate_from_registers(merged, [])
    n = merged.agg(F.count("*").alias("n_registers_set"))
    return n.crossJoin(est)


def run_distinct_monitor(
    event_stream: DataFrame,
    registers_path: str,
    checkpoint: str,
    metrics: list | None = None,
    id_col: str = "user_id",
    available_now: bool = True,
):
    """Start the distinct-count monitor over an events stream.  Returns
    the StreamingQuery.

    ``metrics``: driver-side list; each micro-batch appends
    ``{batch_id, n_registers_set, estimate}`` AFTER the register write
    (a failed batch is never recorded; consumers dedupe on batch_id,
    last entry wins)."""
    # pure function of the checkpoint location: a restart recovering
    # from the same checkpoint overwrites the same run/batch subdirs
    # (exactly-once across restarts; for max-merged registers this is
    # belt-and-braces — duplicates are absorbed anyway); a fresh
    # checkpoint still gets its own token (see ingest._run_token)
    run_token = _run_token(checkpoint)

    def sketch_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = hll_partial(batch_df, id_col)
        subdir = f"run={run_token}/batch={batch_id}"
        partial.write.mode("overwrite").parquet(f"{registers_path}/{subdir}")
        if metrics is None:
            return
        registers = (
            spark.read.option("recursiveFileLookup", "true").parquet(
                registers_path
            )
            if _hadoop_path_exists(spark, registers_path)
            else partial
        )
        row = hll_estimate(registers).collect()[0]
        metrics.append(
            {
                "batch_id": batch_id,
                "n_registers_set": row.n_registers_set,
                "estimate": row.hll_est,
            }
        )

    writer = (
        event_stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

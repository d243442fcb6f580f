"""applyInPandasWithState sessionization: sessions close on gap across
micro-batches; open sessions stay in state."""

from __future__ import annotations

import json
import os


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_sessionize_gap_close(spark, tmp_path):
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_s3_spark.streaming.sessions import (
        streaming_sessionize,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: user 1 has two events 5 min apart (one open session)
    _write(
        src,
        "b1.jsonl",
        [
            {"user_id": 1, "ts": "2024-01-01 10:00:00"},
            {"user_id": 1, "ts": "2024-01-01 10:05:00"},
        ],
    )
    # batch 2 (same file set, availableNow processes all files per run):
    # an event >30min later closes the first session
    _write(src, "b2.jsonl", [{"user_id": 1, "ts": "2024-01-01 11:00:00"}])

    stream = (
        spark.readStream.schema("user_id long, ts string")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    sessions = streaming_sessionize(stream, gap_minutes=30, timeout_ms=None)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(spark.read.parquet(out).collect(), key=lambda r: r.session_start)
    # session 1 closed by the 30-min gap; the 11:00 session stays open
    # in state (timeout flush disabled for batch-replay determinism)
    assert [(r.user_id, str(r.session_start), str(r.session_end), r.n_events) for r in got] == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2),
    ]


def test_transform_with_state_running_counts(spark, tmp_path):
    """transformWithState running counter: per-user totals accumulate
    in the keyed state store ACROSS separate checkpointed drains — the
    Spark 4 arbitrary-state API next to applyInPandasWithState.

    The API's worker protocol needs protobuf on the executors; skip
    where it is absent (this container) — applyInPandasWithState
    covers the stateful contract there."""
    import json as _json
    import os

    import pytest

    pytest.importorskip("google.protobuf.descriptor")

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_s3_spark.streaming.counters import (
        running_user_counts,
    )

    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def drain(tag):
        stream = spark.readStream.schema("user_id long, ts string").json(src)
        counts = running_user_counts(stream)

        def collect(batch_df, batch_id):
            batch_df.withColumn("tag", F.lit(tag)).write.mode("append").parquet(
                sink
            )

        q = (
            counts.writeStream.foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    with open(os.path.join(src, "b1.json"), "w") as f:
        for u in (1, 1, 2):
            f.write(_json.dumps({"user_id": u, "ts": "2024-06-01T10:00:00"}) + "\n")
    drain("b1")
    first = {r.user_id: r.n_events
             for r in spark.read.parquet(sink).filter("tag = 'b1'").collect()}
    assert first == {1: 2, 2: 1}

    with open(os.path.join(src, "b2.json"), "w") as f:
        for u in (1, 3):
            f.write(_json.dumps({"user_id": u, "ts": "2024-06-01T11:00:00"}) + "\n")
    drain("b2")
    second = {r.user_id: r.n_events
              for r in spark.read.parquet(sink).filter("tag = 'b2'").collect()}
    # user 1's count CONTINUES from state (2 -> 3); user 3 starts fresh;
    # user 2 has no new rows, so no re-emission in update semantics
    assert second == {1: 3, 3: 1}

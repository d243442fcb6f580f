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

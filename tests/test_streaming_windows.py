"""Streaming windowed agg: watermark drops late data, windows emit
once closed (append mode)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.streaming.windows import (
    streaming_tumbling_counts,
)


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_watermark_drops_late_events(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    def run():
        stream = (
            spark.readStream.schema("log_type string, ts string")
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )
        agg = streaming_tumbling_counts(
            stream, window="1 hour", watermark="30 minutes"
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch 1: two events in the 10:00 window, one at 13:00 (advances
    # the watermark to 12:30, closing and emitting the 10:00 window)
    _write(
        src,
        "b1.jsonl",
        [
            {"log_type": "a", "ts": "2024-01-01 10:05:00"},
            {"log_type": "a", "ts": "2024-01-01 10:20:00"},
            {"log_type": "b", "ts": "2024-01-01 13:00:00"},
        ],
    )
    run()
    # batch 2: a late event for the already-closed 10:00 window — must
    # be dropped, not re-emitted
    _write(src, "b2.jsonl", [{"log_type": "a", "ts": "2024-01-01 10:40:00"}])
    run()
    # batch 3: advance watermark far enough to close the 13:00 window
    _write(src, "b3.jsonl", [{"log_type": "b", "ts": "2024-01-01 16:00:00"}])
    run()

    rows = [
        (str(r.window_start), r.log_type, r.n_events)
        for r in spark.read.parquet(out).collect()
    ]
    # the 10:00/a window must have emitted EXACTLY once, with 2 events —
    # a re-emission (or the late 10:40 event appearing) is a failure
    ten = [r for r in rows if r[0] == "2024-01-01 10:00:00"]
    assert ten == [("2024-01-01 10:00:00", "a", 2)]
    assert ("2024-01-01 13:00:00", "b", 1) in rows


def test_streaming_session_window(spark, tmp_path):
    """session_window sessions close on gap expiry: two bursts
    separated by > gap become two sessions; the second emits only after
    the watermark passes its end."""
    from terraform_aws_lambda_kinesis_to_s3_spark.streaming.windows import (
        streaming_session_counts,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    def run():
        stream = (
            spark.readStream.schema("user_id string, ts string")
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )
        agg = streaming_session_counts(
            stream, gap="30 minutes", watermark="30 minutes"
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # burst 1 (10:00-10:10), then silence past the 30-min gap, burst 2
    _write(
        src,
        "b1.jsonl",
        [
            {"user_id": "u1", "ts": "2024-01-01 10:00:00"},
            {"user_id": "u1", "ts": "2024-01-01 10:10:00"},
            {"user_id": "u1", "ts": "2024-01-01 12:00:00"},
        ],
    )
    run()
    # advance the watermark far enough to close the 12:00 session too
    _write(src, "b2.jsonl", [{"user_id": "u2", "ts": "2024-01-01 15:00:00"}])
    run()

    rows = sorted(
        (str(r.session_start), r.user_id, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    assert ("2024-01-01 10:00:00", "u1", 2) in rows
    assert ("2024-01-01 12:00:00", "u1", 1) in rows


def test_update_mode_emits_revised_counts(spark, tmp_path):
    """Update output mode: a window's count is re-emitted each batch it
    changes (vs append, which emits once on close) — the mode a live
    dashboard sink consumes. The memory sink accumulates one row per
    revision; the LAST revision per window must equal the true count,
    and an early revision must exist for the window that grew."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "revisions")

    def drain(tag):
        stream = (
            spark.readStream.schema("log_type string, ts string")
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "log_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "log_type", "n")
        )

        def collect_revisions(batch_df, batch_id):
            batch_df.withColumn("tag", F.lit(tag)).write.mode(
                "append"
            ).parquet(sink)

        q = (
            agg.writeStream.foreachBatch(collect_revisions)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write(src, "b1.json", [
        {"log_type": "web", "ts": "2024-06-01T10:05:00"},
        {"log_type": "web", "ts": "2024-06-01T10:10:00"},
    ])
    drain("b1")
    first = {(r.ws.isoformat(), r.log_type): r.n
             for r in spark.read.parquet(sink).filter("tag = 'b1'").collect()}
    assert first[("2024-06-01T10:00:00", "web")] == 2

    _write(src, "b2.json", [
        {"log_type": "web", "ts": "2024-06-01T10:20:00"},  # same window grows
        {"log_type": "api", "ts": "2024-06-01T11:05:00"},
    ])
    drain("b2")
    second = {(r.ws.isoformat(), r.log_type): r.n
              for r in spark.read.parquet(sink).filter("tag = 'b2'").collect()}
    # the revised 10:00 window reflects ALL three events (state carried
    # across restarts via the checkpoint), and the new window appears
    assert second[("2024-06-01T10:00:00", "web")] == 3
    assert second[("2024-06-01T11:00:00", "api")] == 1

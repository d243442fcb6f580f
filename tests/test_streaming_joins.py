"""Stream-stream interval join: matches within the bound, no matches
outside it; stream-static enrich: per-batch broadcast, no state."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, src, schema):
    df = spark.readStream.schema(schema).json(src)
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_stream_stream_interval_join(spark, tmp_path):
    imp_src, clk_src, out, ckpt = (
        str(tmp_path / d) for d in ("imp", "clk", "out", "ckpt")
    )
    _write(
        imp_src,
        "b1.jsonl",
        [
            {"user": "u1", "ts": "2024-01-01 10:00:00", "ad": "a1"},
            {"user": "u2", "ts": "2024-01-01 10:00:00", "ad": "a2"},
            {"user": "u3", "ts": "2024-01-01 10:00:00", "ad": "a3"},
        ],
    )
    _write(
        clk_src,
        "b1.jsonl",
        [
            # in-window click (40 min after impression)
            {"user": "u1", "ts": "2024-01-01 10:40:00", "page": "p1"},
            # out-of-window click (90 min > 1 hour bound)
            {"user": "u2", "ts": "2024-01-01 11:30:00", "page": "p2"},
            # click BEFORE the impression — must not match
            {"user": "u3", "ts": "2024-01-01 09:50:00", "page": "p3"},
        ],
    )
    imps = _stream(spark, imp_src, "user string, ts string, ad string")
    clks = _stream(spark, clk_src, "user string, ts string, page string")
    joined = stream_stream_interval_join(
        imps, clks, key="user", within="1 hour", watermark="2 hours"
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [(r.user, r.l_ad, r.r_page) for r in spark.read.parquet(out).collect()]
    assert rows == [("u1", "a1", "p1")]


def test_stream_static_enrich(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write(
        src,
        "b1.jsonl",
        [
            {"user": "u1", "ts": "2024-01-01 10:00:00"},
            {"user": "u9", "ts": "2024-01-01 10:01:00"},
        ],
    )
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], "dim_user string, tier string"
    )
    stream = _stream(spark, src, "user string, ts string")
    enriched = stream_static_enrich(stream, dim, "user", "dim_user")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (r.user, r.tier) for r in spark.read.parquet(out).collect()
    )
    assert rows == [("u1", "gold"), ("u9", None)]

"""Structured Streaming job: the reference's Lambda loop as a stream.

Reference lifecycle (SURVEY.md §3.1): Kinesis shards -> micro-batch of
<= batch_size records -> decode/parse/validate/route -> S3 partitioned
write, at-least-once with whole-batch retry. Spark mapping:

- source: ``readStream`` — Kinesis connector in production (EMR/Glue
  built-in or spark-sql-kinesis; kept behind :func:`stream_source`),
  file source for tests/replay. ``maxFilesPerTrigger`` plays the role
  of ``batch_size`` (``main.tf:57``).
- transform: the *same* batch transforms (``route_records``) — the
  pipeline is identical in batch and streaming, which is the point of
  building it as pure column expressions.
- dedup: ``dropDuplicatesWithinWatermark`` on ``log_id`` bounds the
  at-least-once replay window with finite state (SURVEY.md §7 hard
  part d — unbounded dropDuplicates state would not survive 100 TB).
- sink: partitioned gzip JSON files + checkpoint = exactly-once (an
  upgrade over the reference's at-least-once, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_s3_spark.functions.decoders import decode_records
from terraform_aws_lambda_kinesis_to_s3_spark.operators.envelope import route_records


def stream_source(
    spark: SparkSession,
    cfg: PipelineConfig,
    format: str = "file",
    path: str | None = None,
    schema: str = "payload string",
) -> DataFrame:
    """Source factory — the engine's one production-boundary seam.
    Every format yields the same shape: a ``payload`` string column of
    fully-decoded logical records.

    ``file``: newline-delimited payload files (tests, replay, and the
    S3-landing pattern where an agent drops raw batches). Payloads are
    already text — no decode chain.
    ``binary-file``: one raw Kinesis ``Data`` blob per file, run
    through the full A2 decode chain (KPL deaggregation, gunzip,
    CloudWatch unwrap) — the connector-free stand-in that exercises the
    exact decode path the kinesis format uses.
    ``kinesis``: requires a Kinesis connector on the cluster (EMR/Glue
    provide one). The connector surfaces ``data`` as raw bytes; the
    reference always runs those through ``kinesis.parse_records``
    (lambda/main.py:47), so this path routes through the same
    ``decode_records`` chain as the batch path — gzipped, KPL-
    aggregated and CloudWatch records land correctly instead of being
    UTF-8-mangled (ADVICE r1, streaming/job.py:59).
    """
    if format == "file":
        return (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", max(1, cfg.batch_size // 100) or 1)
            .load(path)
            .withColumnRenamed("value", "payload")
        )
    if format == "binary-file":
        raw = (
            spark.readStream.format("binaryFile")
            # streaming sources need an explicit schema; binaryFile's is fixed
            .schema(
                "path string, modificationTime timestamp, length long, content binary"
            )
            .option("maxFilesPerTrigger", max(1, cfg.batch_size // 100) or 1)
            .load(path)
            .select(F.col("content").alias("data"))
        )
        return decode_records(raw, base64_encoded=False).select("payload")
    if format == "kinesis":
        if not cfg.kinesis_stream_arn:
            raise ValueError("kinesis source requires cfg.kinesis_stream_arn")
        raw = (
            spark.readStream.format("kinesis")
            .option("streamName", cfg.kinesis_stream_arn.rsplit("/", 1)[-1])
            .option("startingPosition", cfg.starting_position)
            .load()
            .select(F.col("data"))
        )
        return decode_records(raw, base64_encoded=False).select("payload")
    raise ValueError(f"unknown stream source format: {format}")


def run_stream(
    source: DataFrame,
    out_path: str,
    checkpoint: str,
    cfg: PipelineConfig | None = None,
    dedup_watermark: str | None = "1 hour",
    available_now: bool = True,
    exact_layout: bool = False,
    observe: bool = True,
):
    """Route a payload stream into the partitioned gzip JSON sink.

    Returns the StreamingQuery (caller awaits termination).
    ``available_now=True`` drains everything currently available and
    stops — the batch-replay trigger used in tests and backfills.

    ``exact_layout=True`` writes the reference's two-segment
    ``%log_type%/YYYY-MM/DD/`` layout via ``foreachBatch`` (each
    micro-batch goes through the batch sink). Note: foreachBatch is
    at-least-once on retry (the reference's own guarantee,
    main.tf:56-62); the default hive-layout file sink stays
    exactly-once.
    """
    cfg = cfg or PipelineConfig()
    routed = route_records(source, cfg)
    if observe:
        # A12 parity: per-batch in/valid/unknown counters computed
        # inside the batch's own execution (observe = zero extra pass);
        # surfaced via streaming.metrics.RouteMetricsListener
        from terraform_aws_lambda_kinesis_to_s3_spark.streaming.metrics import (
            observe_routes,
        )

        routed = observe_routes(routed, cfg)
    if dedup_watermark:
        # Replay dedup is a *processing-time* concern (the reference's
        # at-least-once retries arrive minutes apart, regardless of the
        # record's own event time — README.md:14), so watermark on
        # arrival time. An event-time watermark here would mark all
        # historical records late during a backfill and silently drop
        # them; state stays bounded either way.
        # invalid records have no log_id — key them by payload hash so
        # distinct dead-letter records survive while replayed ones dedup
        routed = routed.withColumn(
            "__dedup_key",
            F.coalesce(
                F.col("log_id"), F.concat(F.lit("__raw:"), F.md5(F.col("payload")))
            ),
        )
        routed = routed.withColumn("__arrival_ts", F.current_timestamp())
        routed = routed.withWatermark("__arrival_ts", dedup_watermark)
        routed = routed.dropDuplicatesWithinWatermark(["__dedup_key"])
    if exact_layout:
        from terraform_aws_lambda_kinesis_to_s3_spark.sinks import write_routed

        def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
            write_routed(batch_df, out_path, cfg, exact_layout=True)

        writer = (
            routed.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
        )
    else:
        out = routed.select(
            F.col("payload").alias("value"),
            F.col("route").alias("log_type"),
            "ym",
            "dd",
        )
        # cluster rows onto their partition dirs per micro-batch — else
        # every task writes a file into every partition (small-files)
        out = out.repartition(F.col("log_type"), F.col("ym"), F.col("dd"))
        writer = (
            out.writeStream.format("text")
            .partitionBy("log_type", "ym", "dd")
            .option("compression", "gzip")
            .option("checkpointLocation", checkpoint)
            .option("path", out_path)
            .outputMode("append")
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

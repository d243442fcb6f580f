"""Structured Streaming wrapper for the Tier-A pipeline."""

from terraform_aws_lambda_kinesis_to_s3_spark.streaming.job import (
    stream_source,
    run_stream,
)
from terraform_aws_lambda_kinesis_to_s3_spark.streaming.metrics import (
    RouteMetricsListener,
    observe_routes,
)
from terraform_aws_lambda_kinesis_to_s3_spark.streaming.ingest import (
    run_corpus_ingest,
)

__all__ = [
    "stream_source",
    "run_stream",
    "RouteMetricsListener",
    "observe_routes",
    "run_corpus_ingest",
]

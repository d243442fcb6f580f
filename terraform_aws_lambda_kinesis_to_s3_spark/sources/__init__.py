"""Sources: Kinesis-event-shaped batches, file/memory stand-ins."""

from terraform_aws_lambda_kinesis_to_s3_spark.sources.records import (
    KINESIS_EVENT_SCHEMA,
    kinesis_event_to_df,
    payloads_to_df,
)

__all__ = ["KINESIS_EVENT_SCHEMA", "kinesis_event_to_df", "payloads_to_df"]

"""Sinks: (log_type, date)-partitioned gzip JSON (Hive or exact layout)."""

from terraform_aws_lambda_kinesis_to_s3_spark.sinks.partitioned_json import (
    write_routed,
    read_routed,
)

__all__ = ["write_routed", "read_routed"]

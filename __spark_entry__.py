"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Tier-A pipeline query (the
reference's decode/validate/route/partition dataflow re-expressed on
Spark) at sf0.001. ``queries()``/``oracle_sql()`` expose the full
oracle-checked registry from
``terraform_aws_lambda_kinesis_to_s3_spark.plans.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from terraform_aws_lambda_kinesis_to_s3_spark.plans.queries import (
    oracle_queries,
    spark_queries,
)

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return spark_queries()["pipeline_route"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query (same column
    names/types; decimal-exact aggregates; see plans.queries)."""
    return oracle_queries()

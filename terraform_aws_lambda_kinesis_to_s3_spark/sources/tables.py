"""Test-table loader for the driver parquet datasets (TESTDATA.md).

The driver-generated ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark refuses by default; we flip the
session-settable ``spark.sql.legacy.parquet.nanosAsLong`` and convert
nanos -> microseconds ourselves (floor division — identical to how
DuckDB truncates nanos to its native microsecond timestamps, so the
oracle comparison stays exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Load a test table; ``parallelize=True`` rebalances a
    single-file/single-row-group scan across cores before CPU-heavy
    downstream stages (the synthetic tables are one parquet file with
    one row group — unsplittable, so the scan is one task; production
    inputs have natural partitioning and should NOT pay this shuffle).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # oracle comparisons assume UTC rendering of timestamps; pin it even
    # when the caller's session was built with a different default
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if parallelize:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    for field in df.schema.fields:
        # nanosAsLong surfaces TIMESTAMP(NANOS) as LongType nanos
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer division — `/` would round-trip through double and
            # lose sub-microsecond precision on 1e18-scale nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) infers as
            # TIMESTAMP_NTZ; with the session pinned to UTC the cast is a
            # pure type-tag change (same instant, same rendering) and
            # keeps unix_micros()/long-cast arithmetic working downstream
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so users can query the
    engine with plain ``spark.sql`` (same Catalyst plans either way)."""
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

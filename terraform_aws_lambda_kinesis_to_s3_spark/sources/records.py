"""Kinesis-event-shaped ingestion (reference A1, main.tf:56-62).

The reference receives Lambda events shaped
``{"Records":[{"kinesis":{"data": <base64>, "partitionKey": ...}}]}``
(``lambda/main.py:40,47``). In production the Spark engine would use a
Kinesis connector (``spark.readStream.format("kinesis")`` on EMR/Glue,
or the public spark-sql-kinesis connector) — that boundary is kept
behind :func:`stream_source` in ``streaming.job``. For tests and batch
replay, these helpers turn Kinesis-event JSON or plain payload lists
into the ``data`` column the decode chain consumes.
"""

from __future__ import annotations

import base64
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the Lambda event shape (FIXTURES.md §A transport wrapper)
KINESIS_EVENT_SCHEMA = T.StructType(
    [
        T.StructField(
            "Records",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "kinesis",
                            T.StructType(
                                [
                                    T.StructField("data", T.StringType()),
                                    T.StructField("partitionKey", T.StringType()),
                                    T.StructField("sequenceNumber", T.StringType()),
                                    T.StructField(
                                        "approximateArrivalTimestamp", T.DoubleType()
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def kinesis_event_to_df(df_events: DataFrame, event_col: str = "value") -> DataFrame:
    """Explode Kinesis Lambda-event JSON strings into one row per record
    with a base64 ``data`` column (plus partitionKey/sequenceNumber)."""
    parsed = F.from_json(F.col(event_col), KINESIS_EVENT_SCHEMA)
    rec = F.explode(parsed["Records"]).alias("rec")
    return df_events.select(rec).select(
        F.col("rec")["kinesis"]["data"].alias("data"),
        F.col("rec")["kinesis"]["partitionKey"].alias("partition_key"),
        F.col("rec")["kinesis"]["sequenceNumber"].alias("sequence_number"),
    )


def payloads_to_df(
    spark: SparkSession, payloads: Iterable[bytes | str], b64: bool = True
) -> DataFrame:
    """Test helper: raw payload blobs -> single-column ``data`` frame
    (base64 strings when ``b64``, matching the Kinesis transport)."""
    rows = []
    for p in payloads:
        b = p.encode() if isinstance(p, str) else p
        rows.append((base64.b64encode(b).decode() if b64 else b,))
    field = T.StructField("data", T.StringType() if b64 else T.BinaryType())
    return spark.createDataFrame(rows, T.StructType([field]))

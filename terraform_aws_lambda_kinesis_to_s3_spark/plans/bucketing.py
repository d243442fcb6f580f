"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the dominant cost of the fact-to-fact join (lineitem x
orders) is the shuffle of both sides. Bucketing both tables on the
join key at write time (`bucketBy` + `sortBy` into the catalog) makes
the join a zero-exchange sort-merge: each task reads matching buckets
from both sides. This module wraps the write path and the join so the
property is testable (the plan must contain no Exchange above the
scans).

Write amortization: you bucket once at ingest, then every downstream
join on that key is shuffle-free — the right trade whenever a fact
table is joined on the same key repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys.

    With equal bucket counts Spark plans a sort-merge join with no
    Exchange on either side.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])

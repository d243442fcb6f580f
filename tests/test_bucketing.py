"""Bucketed co-located join: the join plan must contain no Exchange —
the shuffle happened once at write time."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)
from terraform_aws_lambda_kinesis_to_s3_spark.sources.tables import load_table


def test_bucketed_join_no_exchange(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    od = load_table(spark, sf, "orders")

    # disable auto-broadcast so the test exercises the SMJ path the
    # bucketing is designed for (at scale neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(li, "b_lineitem", "l_orderkey", buckets=4)
        write_bucketed(od, "b_orders", "o_orderkey", buckets=4)

        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all

        # and it computes the right thing
        n = joined.count()
        plain = li.join(od, li.l_orderkey == od.o_orderkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")

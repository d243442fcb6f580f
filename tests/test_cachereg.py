"""Query-local cache inventory (cachereg, ADVICE r11 items 2-3):
tracked persists are released on demand, and explain-only consumers
can skip the eager materialization without changing plan shape."""

from __future__ import annotations

from terraform_aws_lambda_kinesis_to_s3_spark import cachereg as CR

SF = "/root/testdata/sf0.001"


def test_track_and_release_all(spark):
    df = spark.range(10).persist()
    assert CR.track(df) is df
    df.count()
    assert df.storageLevel.useMemory
    CR.release_all()
    assert not df.storageLevel.useMemory  # unpersisted
    assert CR.TRACKED == []
    CR.release_all()  # idempotent on empty inventory


def test_release_all_survives_broken_entries(spark):
    class Boom:
        def unpersist(self):
            raise RuntimeError("already gone")

    CR.track(Boom())
    good = CR.track(spark.range(5).persist())
    CR.release_all()
    assert not good.storageLevel.useMemory
    assert CR.TRACKED == []


def test_eager_materialize_flag_skips_count():
    class CountSpy:
        calls = 0

        def count(self):
            CountSpy.calls += 1

    spy = CountSpy()
    CR.materialize(spy)
    assert CountSpy.calls == 1
    try:
        CR.EAGER_MATERIALIZE = False
        CR.materialize(spy)
        assert CountSpy.calls == 1  # skipped
    finally:
        CR.EAGER_MATERIALIZE = True


def test_plan_only_build_keeps_persist_boundaries(spark):
    """With EAGER_MATERIALIZE off, building an eager-persist query
    still produces the SAME plan shape (InMemoryTableScan boundaries
    present) — only the count() actions are skipped, so explain-only
    tooling does not execute the build."""
    import contextlib
    import io

    from terraform_aws_lambda_kinesis_to_s3_spark.plans.queries import (
        REGISTRY,
    )

    try:
        CR.EAGER_MATERIALIZE = False
        df = REGISTRY["graph_triangle_parts_capped"][0](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "InMemoryTableScan" in buf.getvalue()
    finally:
        CR.EAGER_MATERIALIZE = True
        CR.release_all()

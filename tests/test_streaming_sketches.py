"""Streaming HLL distinct-count monitor (streaming/sketches.py):
batch-parity of the estimate, replay idempotence (the property that
distinguishes register state from count state), monotone growth."""

from __future__ import annotations

import json
import os

from terraform_aws_lambda_kinesis_to_s3_spark.operators.sketches import (
    hll_distinct,
)
from terraform_aws_lambda_kinesis_to_s3_spark.streaming.sketches import (
    run_distinct_monitor,
)


def _write_events(src_dir, name, rows):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, uid):
    return {
        "event_id": eid,
        "ts": "2024-03-01T12:00:00",
        "user_id": uid,
        "event_type": "view",
        "value": 1.0,
        "props": "{}",
    }


SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).json(src)


def _run(spark, src, registers, ckpt):
    metrics = []
    q = run_distinct_monitor(_stream(spark, src), registers, ckpt, metrics)
    q.awaitTermination(120)
    return metrics


def test_streaming_estimate_matches_batch_operator(spark, tmp_path):
    """The monitor's final estimate over two micro-batch files must
    equal hll_distinct over the union of their user_ids — the streaming
    path and the batch path are the same sketch."""
    src = str(tmp_path / "src")
    users1 = list(range(0, 300))
    users2 = list(range(200, 500))  # overlaps batch 1
    _write_events(src, "b1.json", [_ev(i, u) for i, u in enumerate(users1)])
    _write_events(
        src, "b2.json", [_ev(1000 + i, u) for i, u in enumerate(users2)]
    )
    metrics = _run(
        spark, src, str(tmp_path / "regs"), str(tmp_path / "ckpt")
    )
    assert metrics, "no batches recorded"
    final = metrics[-1]["estimate"]

    batch_df = spark.createDataFrame(
        [(u,) for u in set(users1) | set(users2)], "user_id long"
    )
    expected = hll_distinct(batch_df, [], "user_id").collect()[0].hll_est
    assert final == expected
    # 500 true distinct; 256-register HLL should land in a sane band
    assert 350 < final < 700


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """A full replay from a FRESH checkpoint into the same registers
    directory must leave the estimate exactly unchanged — max-merged
    registers absorb duplicate partials (at-least-once == exactly-once
    for this state), unlike any count-valued state."""
    src = str(tmp_path / "src")
    _write_events(src, "b1.json", [_ev(i, i % 120) for i in range(600)])

    m1 = _run(spark, src, str(tmp_path / "regs"), str(tmp_path / "ckpt1"))
    est1 = m1[-1]["estimate"]
    # fresh checkpoint -> the same file is re-delivered (a replay)
    m2 = _run(spark, src, str(tmp_path / "regs"), str(tmp_path / "ckpt2"))
    est2 = m2[-1]["estimate"]
    assert est2 == est1
    assert m2[-1]["n_registers_set"] == m1[-1]["n_registers_set"]


def test_restart_same_checkpoint_absorbed(spark, tmp_path):
    """A driver restart recovering from the SAME checkpoint re-delivers
    the in-flight batch; the checkpoint-derived run token makes the
    re-delivery OVERWRITE the same run/batch partial.  Max-merged
    registers would absorb a duplicate partial anyway (the fresh-
    checkpoint replay test pins that), so estimate equality alone
    cannot discriminate — the discriminating check is that the
    registers directory holds exactly ONE run=<token> subdir and ONE
    partial copy after the restart (a uuid-per-process token would
    leave two).  Simulated by wiping the checkpoint (the
    un-committed-offsets crash point) and restarting at the same
    location."""
    import glob
    import shutil

    src = str(tmp_path / "src")
    _write_events(src, "b1.json", [_ev(i, i % 80) for i in range(400)])
    regs = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ck")
    m1 = _run(spark, src, regs, ckpt)
    shutil.rmtree(ckpt)  # crash before the offset commit
    m2 = _run(spark, src, regs, ckpt)  # restart, SAME location
    assert m2[-1]["estimate"] == m1[-1]["estimate"]
    assert m2[-1]["n_registers_set"] == m1[-1]["n_registers_set"]
    runs = glob.glob(os.path.join(regs, "run=*"))
    assert len(runs) == 1, f"expected one run subdir, got {runs}"
    batches = glob.glob(os.path.join(runs[0], "batch=*"))
    assert len(batches) == 1, f"expected one batch partial, got {batches}"


def test_streaming_estimate_grows_with_new_users(spark, tmp_path):
    """New users in a later batch must not decrease the estimate, and
    genuinely new mass must increase it."""
    src = str(tmp_path / "src")
    _write_events(src, "b1.json", [_ev(i, i) for i in range(100)])
    metrics1 = _run(
        spark, src, str(tmp_path / "regs"), str(tmp_path / "ckptA")
    )
    est_after_1 = metrics1[-1]["estimate"]

    _write_events(
        src, "b2.json", [_ev(5000 + i, 5000 + i) for i in range(400)]
    )
    metrics2 = _run(
        spark, src, str(tmp_path / "regs"), str(tmp_path / "ckptB")
    )
    est_after_2 = metrics2[-1]["estimate"]
    assert est_after_2 > est_after_1

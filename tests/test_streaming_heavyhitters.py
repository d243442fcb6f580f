"""Streaming heavy-hitters monitor (streaming/heavyhitters.py):
exactness when nothing is dropped, bound coverage when keys ARE
dropped, replay invariance of ranking/fractions, retry absorption."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.streaming.heavyhitters import (
    hh_merged_topk,
    hh_partial,
    run_heavyhitter_monitor,
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


def _run(spark, src, summaries, ckpt, summary_k=20):
    metrics = []
    q = run_heavyhitter_monitor(
        spark.readStream.schema(SCHEMA).json(src),
        summaries,
        ckpt,
        metrics,
        summary_k=summary_k,
    )
    q.awaitTermination(120)
    return metrics


def _zipfish(n_keys, reps):
    """key k appears reps - k times (distinct frequencies, no ties)."""
    out = []
    for k in range(n_keys):
        out += [k] * (reps - k)
    return out


def test_exact_when_summary_covers_all_keys(spark, tmp_path):
    """Every batch has <= K' distinct keys: thresholds are 0, the
    merged estimates are EXACT and every bound is 0."""
    src = str(tmp_path / "src")
    u1 = _zipfish(10, 12)  # keys 0..9, counts 12..3
    u2 = _zipfish(10, 8)  # keys 0..7 (8-k > 0), counts 8..1
    _write_events(src, "b1.json", [_ev(i, u) for i, u in enumerate(u1)])
    _write_events(
        src, "b2.json", [_ev(10_000 + i, u) for i, u in enumerate(u2)]
    )
    metrics = _run(
        spark, src, str(tmp_path / "sm"), str(tmp_path / "ck"), summary_k=20
    )
    assert metrics
    truth = {}
    for u in u1 + u2:
        truth[u] = truth.get(u, 0) + 1
    expected = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = metrics[-1]["topk"]
    assert [(k, c) for k, c, *_ in got] == expected
    for _, est, upper, _, bound_frac in got:
        assert upper == est and bound_frac == 0.0


def test_bound_covers_dropped_keys(spark, tmp_path):
    """summary_k=3 forces drops: for every reported key,
    lower <= true <= upper must hold against the exact census."""
    src = str(tmp_path / "src")
    u1 = _zipfish(8, 10)  # 8 keys per batch, only top 3 summarized
    u2 = [k for k in _zipfish(8, 9) if True]
    _write_events(src, "b1.json", [_ev(i, u) for i, u in enumerate(u1)])
    _write_events(
        src, "b2.json", [_ev(10_000 + i, u) for i, u in enumerate(u2)]
    )
    metrics = _run(
        spark, src, str(tmp_path / "sm"), str(tmp_path / "ck"), summary_k=3
    )
    truth = {}
    for u in u1 + u2:
        truth[u] = truth.get(u, 0) + 1
    for key, est, upper, _, _ in metrics[-1]["topk"]:
        assert est <= truth[key] <= upper, (key, est, truth[key], upper)


def test_streaming_replay_ranking_invariant(spark, tmp_path):
    """A fresh-checkpoint replay doubles absolute counts and bounds
    but leaves ordering, est_frac and bound_frac EXACTLY unchanged —
    uniform scaling cancels in every ratio."""
    src = str(tmp_path / "src")
    u1 = _zipfish(12, 15)
    _write_events(src, "b1.json", [_ev(i, u) for i, u in enumerate(u1)])
    sm = str(tmp_path / "sm")
    m1 = _run(spark, src, sm, str(tmp_path / "ck1"), summary_k=5)
    m2 = _run(spark, src, sm, str(tmp_path / "ck2"), summary_k=5)  # replay
    t1, t2 = m1[-1]["topk"], m2[-1]["topk"]
    assert [k for k, *_ in t1] == [k for k, *_ in t2]
    for (k1, c1, up1, f1, b1), (k2, c2, up2, f2, b2) in zip(t1, t2):
        assert c2 == 2 * c1 and up2 == 2 * up1
        assert f2 == f1 and b2 == b1


def test_same_run_retry_absorbed_exactly(spark, tmp_path):
    """Re-writing the same batch summary under one run/batch path
    (the at-least-once retry) leaves the merged top-k identical."""
    df = spark.createDataFrame(
        [(u,) for u in _zipfish(6, 7)], "user_id long"
    )
    p = str(tmp_path / "sm" / "run=tok" / "batch=0")
    part = hh_partial(df, "user_id", 4).withColumn(
        "__batch", F.lit("tok/0")
    )
    part.write.mode("overwrite").parquet(p)

    def read_topk():
        s = spark.read.option("recursiveFileLookup", "true").parquet(
            str(tmp_path / "sm")
        )
        return [tuple(r) for r in hh_merged_topk(s, 5).collect()]

    once = read_topk()
    part.write.mode("overwrite").parquet(p)  # retry
    assert read_topk() == once


def test_empty_batch_contributes_nothing(spark, tmp_path):
    """An empty micro-batch writes an empty summary (schema only) and
    the merged top-k over a real + empty summary pile equals the
    real-only answer — no phantom thresholds, no crash."""
    df = spark.createDataFrame([(u,) for u in _zipfish(5, 6)], "user_id long")
    empty = df.filter("user_id < 0")
    base = str(tmp_path / "sm")
    hh_partial(df, "user_id", 3).withColumn("__batch", F.lit("t/0")) \
        .write.mode("overwrite").parquet(base + "/run=t/batch=0")
    real_only = [
        tuple(r)
        for r in hh_merged_topk(
            spark.read.option("recursiveFileLookup", "true").parquet(base), 5
        ).collect()
    ]
    hh_partial(empty, "user_id", 3).withColumn("__batch", F.lit("t/1")) \
        .write.mode("overwrite").parquet(base + "/run=t/batch=1")
    with_empty = [
        tuple(r)
        for r in hh_merged_topk(
            spark.read.option("recursiveFileLookup", "true").parquet(base), 5
        ).collect()
    ]
    assert with_empty == real_only


def test_restart_same_checkpoint_absorbed(spark, tmp_path):
    """A driver restart recovering from the SAME checkpoint re-delivers
    the in-flight batch; the checkpoint-derived run token makes the
    re-delivery OVERWRITE the same run/batch summary, so absolute
    counts and bounds are EXACTLY those of a single delivery — unlike
    the fresh-checkpoint replay, which doubles them.  Simulated by
    wiping the checkpoint (the un-committed-offsets crash point) and
    restarting at the same location."""
    import shutil

    src = str(tmp_path / "src")
    u1 = _zipfish(12, 15)
    _write_events(src, "b1.json", [_ev(i, u) for i, u in enumerate(u1)])
    sm = str(tmp_path / "sm")
    ckpt = str(tmp_path / "ck")
    m1 = _run(spark, src, sm, ckpt, summary_k=5)
    shutil.rmtree(ckpt)  # crash before the offset commit
    m2 = _run(spark, src, sm, ckpt, summary_k=5)  # restart, SAME location
    assert m1[-1]["topk"] == m2[-1]["topk"]  # absorbed, not doubled


def test_hh_partial_grouped_equals_per_group(spark):
    """hh_partial(group_cols=...) must be row-identical to filtering
    the input to each group and calling the plain form — the contract
    that lets hh_merge_bounds run its 4 shards as one grouped subtree
    (r12 optimization round) while the streaming monitor keeps the
    ungrouped plan."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_s3_spark.streaming.heavyhitters import (
        hh_partial,
    )

    users = [f"u{i % 37}" for i in range(400)] + ["hot"] * 60
    df = spark.createDataFrame(
        [(u, i % 3) for i, u in enumerate(users)], "user_id string, shard int"
    )
    grouped = {
        (r["shard"], r["__key"]): (r["__c"], r["__thr"], r["__n"])
        for r in hh_partial(
            df, "user_id", 5, group_cols=("shard",)
        ).collect()
    }
    per_group = {}
    for s in range(3):
        for r in hh_partial(
            df.filter(F.col("shard") == s).select("user_id"), "user_id", 5
        ).collect():
            per_group[(s, r["__key"])] = (r["__c"], r["__thr"], r["__n"])
    assert grouped == per_group and grouped

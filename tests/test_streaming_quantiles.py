"""Streaming quantile monitor (streaming/quantiles.py): batch parity
of the estimate, replay INVARIANCE of the quantile readout (the
property that distinguishes ratio-of-mass state from count state),
and the exact-integer bucket function."""

from __future__ import annotations

import json
import math
import os

from terraform_aws_lambda_kinesis_to_s3_spark.streaming.quantiles import (
    bucket_partial,
    log_bucket,
    quantile_estimate,
    run_quantile_monitor,
)


def _write_events(src_dir, name, rows):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, value):
    return {
        "event_id": eid,
        "ts": "2024-03-01T12:00:00",
        "user_id": eid % 17,
        "event_type": "view",
        "value": value,
        "props": "{}",
    }


SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).json(src)


def _run(spark, src, buckets, ckpt):
    metrics = []
    q = run_quantile_monitor(_stream(spark, src), buckets, ckpt, metrics)
    q.awaitTermination(120)
    return metrics


def _python_mirror(values, qs=(0.5, 0.9, 0.99)):
    """Pure-Python reimplementation of bucket → interpolate."""
    census = {}
    for v in values:
        m = math.floor(v * 100) + 1
        b = m.bit_length() - 1
        census[b] = census.get(b, 0) + 1
    n = float(len(values))
    out = {}
    for q in qs:
        before = 0
        for b in sorted(census):
            c = census[b]
            if before < q * n <= before + c:
                v_lo = (2.0**b - 1) / 100.0
                v_hi = (2.0 ** (b + 1) - 1) / 100.0
                out[q] = v_lo + (v_hi - v_lo) * (q * n - before) / c
                break
            before += c
    return out


def test_log_bucket_exact_integer_octaves(spark):
    """Bucket boundaries are exact: values straddling each power-of-two
    m-boundary land in adjacent octaves; bucket 0 holds value 0."""
    cases = [
        (0.0, 0),  # m=1 -> bucket 0
        (0.01, 1),  # m=2
        (0.02, 1),  # m=3
        (0.03, 2),  # m=4
        (1.27, 7),  # m=128
        (1.26, 6),  # m=127
        (655.35, 16),  # m=65536
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "value double")
    got = [
        r.b
        for r in df.select(log_bucket(df.value).alias("b")).collect()
    ]
    assert got == [b for _, b in cases]


def test_streaming_estimate_matches_python_mirror(spark, tmp_path):
    """The monitor's final p50/p90/p99 over two micro-batch files must
    equal the pure-Python mirror over the union of their values."""
    src = str(tmp_path / "src")
    vals1 = [0.5 + 0.37 * i for i in range(200)]
    vals2 = [40.0 + 1.13 * i for i in range(200)]
    _write_events(src, "b1.json", [_ev(i, v) for i, v in enumerate(vals1)])
    _write_events(
        src, "b2.json", [_ev(1000 + i, v) for i, v in enumerate(vals2)]
    )
    metrics = _run(
        spark, src, str(tmp_path / "bkts"), str(tmp_path / "ckpt")
    )
    assert metrics, "no batches recorded"
    final = metrics[-1]
    assert final["n_total"] == 400
    mirror = _python_mirror(vals1 + vals2)
    assert abs(final["p50"] - mirror[0.5]) < 1e-9
    assert abs(final["p90"] - mirror[0.9]) < 1e-9
    assert abs(final["p99"] - mirror[0.99]) < 1e-9
    # octave-width guarantee: estimate within the true value's octave
    exact = sorted(vals1 + vals2)
    for q, key in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        true_v = exact[int(q * 400) - 1]
        assert final[key] <= 2 * true_v + 0.02
        assert final[key] >= true_v / 2 - 0.02


def test_streaming_replay_quantiles_invariant(spark, tmp_path):
    """A full replay from a FRESH checkpoint into the same bucket
    store doubles n_total (counts are additive, unlike HLL registers)
    — but every quantile estimate is EXACTLY unchanged, because
    interpolation reads only relative mass.  This is the module's
    contract: deliverable replay-invariant, internals not."""
    src = str(tmp_path / "src")
    vals = [1.0 + 0.77 * i for i in range(300)]
    _write_events(src, "b1.json", [_ev(i, v) for i, v in enumerate(vals)])
    buckets = str(tmp_path / "bkts")
    m1 = _run(spark, src, buckets, str(tmp_path / "ckpt1"))
    m2 = _run(spark, src, buckets, str(tmp_path / "ckpt2"))  # replay
    assert m1 and m2
    assert m2[-1]["n_total"] == 2 * m1[-1]["n_total"]
    for key in ("p50", "p90", "p99"):
        assert m2[-1][key] == m1[-1][key]


def test_same_run_retry_absorbed_exactly(spark, tmp_path):
    """A same-run retried batch overwrites its own partial: feeding the
    same batch census twice under one run/batch path leaves both the
    counts and the estimates identical to a single write."""
    df = spark.createDataFrame(
        [(0.5 + 0.1 * i,) for i in range(100)], "value double"
    )
    p = str(tmp_path / "bkts" / "run=tok" / "batch=0")
    bucket_partial(df).write.mode("overwrite").parquet(p)
    once = {
        r.q: (r.v_est, r.n_total)
        for r in quantile_estimate(
            spark.read.option("recursiveFileLookup", "true").parquet(
                str(tmp_path / "bkts")
            )
        ).collect()
    }
    bucket_partial(df).write.mode("overwrite").parquet(p)  # retry
    twice = {
        r.q: (r.v_est, r.n_total)
        for r in quantile_estimate(
            spark.read.option("recursiveFileLookup", "true").parquet(
                str(tmp_path / "bkts")
            )
        ).collect()
    }
    assert once == twice
    assert once[0.5][1] == 100


def test_empty_batch_contributes_nothing(spark, tmp_path):
    """An empty micro-batch census merges as zero mass: estimates over
    a real + empty census pile equal the real-only answer."""
    df = spark.createDataFrame(
        [(0.5 + 0.3 * i,) for i in range(50)], "value double"
    )
    base = str(tmp_path / "bk")
    bucket_partial(df).write.mode("overwrite").parquet(base + "/run=t/batch=0")
    real_only = {
        r.q: (r.v_est, r.n_total)
        for r in quantile_estimate(
            spark.read.option("recursiveFileLookup", "true").parquet(base)
        ).collect()
    }
    bucket_partial(df.filter("value < 0")).write.mode("overwrite").parquet(
        base + "/run=t/batch=1"
    )
    with_empty = {
        r.q: (r.v_est, r.n_total)
        for r in quantile_estimate(
            spark.read.option("recursiveFileLookup", "true").parquet(base)
        ).collect()
    }
    assert with_empty == real_only


def test_restart_same_checkpoint_absorbed(spark, tmp_path):
    """A driver restart recovering from the SAME checkpoint re-delivers
    the in-flight batch; because the run token is a pure function of
    the checkpoint location, the re-delivery OVERWRITES the same
    run/batch partial — n_total and every quantile are EXACTLY those of
    a single delivery (the crash-restart path is exactly-once, not just
    the same-process retry).  Simulated by wiping the checkpoint (the
    un-committed-offsets crash point) and restarting at the same
    location."""
    import shutil

    src = str(tmp_path / "src")
    vals = [1.0 + 0.77 * i for i in range(300)]
    _write_events(src, "b1.json", [_ev(i, v) for i, v in enumerate(vals)])
    buckets = str(tmp_path / "bkts")
    ckpt = str(tmp_path / "ckpt")
    m1 = _run(spark, src, buckets, ckpt)
    shutil.rmtree(ckpt)  # crash before the offset commit
    m2 = _run(spark, src, buckets, ckpt)  # restart, SAME location
    assert m1 and m2
    assert m2[-1]["n_total"] == m1[-1]["n_total"]  # absorbed, not doubled
    for key in ("p50", "p90", "p99"):
        assert m2[-1][key] == m1[-1][key]

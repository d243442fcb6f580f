"""Streaming corpus ingestion: quality gate + incremental dedup fork
(streaming/ingest.py) — curated/rejected sinks, idempotent replay."""

from __future__ import annotations

import json
import os

from terraform_aws_lambda_kinesis_to_s3_spark.streaming.ingest import (
    run_corpus_ingest,
)

GOOD_A = (
    "the cat and the dog are in the house with a ball. "
    "the sun is warm and the day is long."
)
GOOD_B = (
    "a key part of the plan is that the table and the row are in the "
    "set for a scan of the data."
)
GOOD_C = (
    "the third document in the set is also made of the usual common "
    "words, and it is long enough to pass the quality gate."
)
SHORT = "too short"


def _write_docs(src_dir, name, rows):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _doc(i, text, source="s0"):
    return {"doc_id": i, "text": text, "lang": "en", "source": source}


def _stream(spark, src):
    return (
        spark.readStream.schema("doc_id long, text string, lang string, source string")
        .json(src)
    )


def test_corpus_ingest_gate_dedup_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    curated = str(tmp_path / "curated")
    rejected = str(tmp_path / "rejected")
    history = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: one good doc, an exact dup of it (same batch), one short
    _write_docs(src, "b1.json", [
        _doc(1, GOOD_A),
        _doc(2, GOOD_A),       # within-batch dup -> dropped, survivor=1
        _doc(3, SHORT),        # rejected: too_short
    ])
    metrics = []
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history, ckpt,
                          metrics=metrics)
    q.awaitTermination(120)
    assert metrics and metrics[0]["n_in"] == 3
    assert metrics[0]["n_rejected"] == 1 and metrics[0]["n_new"] == 1

    cur = {r.doc_id for r in spark.read.parquet(curated).collect()}
    rej = {(r.doc_id, r.reject_reason)
           for r in spark.read.parquet(rejected).collect()}
    assert cur == {1}
    assert rej == {(3, "too_short")}

    # batch 2: a re-delivery of doc 1 (new doc_id), plus a genuinely new doc
    _write_docs(src, "b2.json", [
        _doc(10, GOOD_A),      # cross-batch dup -> anti-joined away
        _doc(11, GOOD_B),
    ])
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history, ckpt)
    q.awaitTermination(120)

    cur = {r.doc_id for r in spark.read.parquet(curated).collect()}
    assert cur == {1, 11}
    # history holds exactly the curated fingerprints
    assert spark.read.parquet(history).distinct().count() == 2

    # replay from a FRESH checkpoint (simulated at-least-once retry of
    # everything): the fingerprint anti-join makes it a no-op
    ckpt2 = str(tmp_path / "ckpt2")
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history, ckpt2)
    q.awaitTermination(120)
    rows = spark.read.parquet(curated).collect()
    assert {r.doc_id for r in rows} == {1, 11}
    assert len(rows) == 2  # replay appended NOTHING (no duplicate rows)

    # fresh checkpoint + a genuinely NEW doc: batch numbering restarts
    # at 0, but run-scoped directories mean the old batch-0 output is
    # NOT overwritten (the data-loss hazard of batch-id-only naming)
    _write_docs(src, "b3.json", [_doc(20, GOOD_C)])
    ckpt3 = str(tmp_path / "ckpt3")
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history, ckpt3)
    q.awaitTermination(120)
    rows = spark.read.parquet(curated).collect()
    assert {r.doc_id for r in rows} == {1, 11, 20}
    assert len(rows) == 3


def test_corpus_ingest_same_batch_identical_redelivery(spark, tmp_path):
    """An at-least-once source can deliver the IDENTICAL record (same
    doc_id, same text → same fp) twice inside one micro-batch.  The
    (fp, min doc_id) semi-join alone keeps both copies; the
    dropDuplicates(["fp"]) after it must collapse them to one row."""
    src = str(tmp_path / "src")
    _write_docs(src, "b1.json", [
        _doc(1, GOOD_A),
        _doc(1, GOOD_A),       # exact same-batch re-delivery
        _doc(2, GOOD_B),
    ])
    curated = str(tmp_path / "curated")
    metrics = []
    q = run_corpus_ingest(
        _stream(spark, src), curated, str(tmp_path / "rejected"),
        str(tmp_path / "history"), str(tmp_path / "ckpt"),
        metrics=metrics,
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(curated).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]  # ONE copy of doc 1
    assert metrics[0]["n_in"] == 3 and metrics[0]["n_new"] == 2


def test_corpus_ingest_metrics_conservation_across_replay(spark, tmp_path):
    """Conservation law for the ingest metrics contract, pinned like
    route-totality: for every recorded micro-batch,

        n_in == n_rejected + n_new + n_deduped   (n_deduped >= 0)

    and the FILES agree with the counters — curated row count equals
    the sum of n_new across all runs — including an at-least-once
    replay of the same inputs from a fresh checkpoint (which must
    record n_new == 0 for every replayed batch)."""
    src = str(tmp_path / "src")
    _write_docs(src, "b1.json", [
        _doc(1, GOOD_A),
        _doc(2, GOOD_A, source="s1"),   # within-batch dup (different id)
        _doc(2, GOOD_A, source="s1"),   # identical same-batch re-delivery
        _doc(3, SHORT),                 # rejected
        _doc(4, GOOD_B),
        _doc(5, "zzz qqq xxx vvv kkk jjj mmm nnn ppp rrr"),  # low quality
    ])
    curated = str(tmp_path / "curated")
    rejected = str(tmp_path / "rejected")
    history = str(tmp_path / "history")

    def conserve(entries):
        for m in entries:
            n_deduped = m["n_in"] - m["n_rejected"] - m["n_new"]
            assert n_deduped >= 0, m
            assert m["n_in"] == m["n_rejected"] + m["n_new"] + n_deduped

    metrics = []
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history,
                          str(tmp_path / "ckpt"), metrics=metrics)
    q.awaitTermination(120)
    conserve(metrics)
    assert metrics[0]["n_in"] == 6 and metrics[0]["n_rejected"] == 2
    assert metrics[0]["n_new"] == 2  # GOOD_A survivor + GOOD_B

    # at-least-once replay: fresh checkpoint, same inputs
    metrics2 = []
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history,
                          str(tmp_path / "ckpt2"), metrics=metrics2)
    q.awaitTermination(120)
    conserve(metrics2)
    assert all(m["n_new"] == 0 for m in metrics2)  # history anti-join

    cur = spark.read.parquet(curated)
    total_new = sum(m["n_new"] for m in metrics + metrics2)
    assert cur.count() == total_new == 2
    assert cur.select("doc_id").distinct().count() == cur.count()
    # rejected is an at-least-once audit log: consumers dedupe on
    # (doc_id, reason); distinct count equals one run's n_rejected
    rej = spark.read.parquet(rejected)
    assert rej.select("doc_id", "reject_reason").distinct().count() == 2


def test_corpus_ingest_quality_reason_column(spark, tmp_path):
    """Low-quality (no stopwords, weird shape) vs too-short rejections
    carry distinct reasons."""
    src = str(tmp_path / "src")
    _write_docs(src, "b1.json", [
        _doc(1, "zzz qqq xxx vvv kkk jjj mmm nnn ppp rrr"),  # no stopwords
        _doc(2, "tiny doc"),
    ])
    curated = str(tmp_path / "curated")
    rejected = str(tmp_path / "rejected")
    q = run_corpus_ingest(
        _stream(spark, src), curated, rejected,
        str(tmp_path / "history"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rej = {r.doc_id: r.reject_reason for r in spark.read.parquet(rejected).collect()}
    assert rej[2] == "too_short"
    assert rej.get(1) in ("low_quality", None) or 1 not in rej


def test_restart_same_checkpoint_absorbed(spark, tmp_path):
    """A driver restart recovering from the SAME checkpoint re-delivers
    the in-flight batch; the checkpoint-derived run token makes both
    recovery-path crash points exactly-once (the guarantee ladder's
    second rung, previously pinned only by the docstring):

    - crash AFTER the curated+history writes: the re-delivered docs
      anti-join away against the crashed attempt's own history — the
      curated output is not touched;
    - crash BETWEEN the curated and history writes (simulated by
      deleting history but keeping curated): the re-delivery
      overwrites the SAME run/batch curated directory with identical
      rows and completes the history write — one copy, where a
      uuid-per-process token would have appended a second.
    """
    import shutil

    src = str(tmp_path / "src")
    curated = str(tmp_path / "curated")
    rejected = str(tmp_path / "rejected")
    history = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(src, "b1.json", [_doc(1, GOOD_A), _doc(2, GOOD_B)])
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(curated).collect()
    assert {r.doc_id for r in rows} == {1, 2} and len(rows) == 2

    # crash point 1: offsets lost after both writes landed
    shutil.rmtree(ckpt)
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(curated).collect()
    assert {r.doc_id for r in rows} == {1, 2} and len(rows) == 2

    # crash point 2: curated landed, history did not
    shutil.rmtree(ckpt)
    shutil.rmtree(history)
    q = run_corpus_ingest(_stream(spark, src), curated, rejected, history, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(curated).collect()
    assert {r.doc_id for r in rows} == {1, 2} and len(rows) == 2
    # RAW count, not distinct: history rows are unique fps by
    # construction, so a uuid-per-process token appending a second
    # identical copy would keep distinct()==2 and hide the regression;
    # the raw row count is the discriminating check.
    assert spark.read.parquet(history).count() == 2

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

"""Streaming corpus ingestion: the Tier-A streaming machinery applied
to the Tier-B curation operators — documents arrive as a stream, pass
the quality gate, dedup incrementally against ALL history, and fork to
curated / rejected sinks.

This is the shape a production training-data pipeline ingests with:
the reference's Kinesis→S3 topology (micro-batch in, partitioned files
out) but with corpus curation instead of log routing in the middle.
Dataflow per micro-batch (foreachBatch, one fork point):

    batch ──quality gate──┬── pass ──within-batch fp dedup──
                          │        ──anti-join history fps── curated/
                          │                      └─ new fps → history/
                          └── fail (reason column) ───────── rejected/

The history side is O(distinct fingerprints) — only (fp) rows are ever
re-read, never the curated corpus itself (same contract as the batch
``incremental_dedup_check``). foreachBatch is at-least-once on retry;
the fingerprint anti-join makes re-delivered documents idempotent,
which is exactly why the history append happens AFTER the curated
write inside the same batch function (a replayed batch re-filters
against the already-updated history and writes nothing new).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.operators import textops as X

#: quality-gate threshold on textops.quality_features' composite score
QUALITY_MIN_SCORE = 0.55
#: documents shorter than this many whitespace tokens are rejected
MIN_TOKENS = 5


def gate_documents(docs: DataFrame) -> DataFrame:
    """Pure-Catalyst quality gate: adds ``fp`` (normalized-text
    fingerprint), ``reject_reason`` (NULL = accepted). Map-only."""
    scored = X.quality_features(docs).withColumn(
        "fp", X.fingerprint(F.col("text"))
    )
    return scored.withColumn(
        "reject_reason",
        F.when(F.col("n_tokens") < MIN_TOKENS, F.lit("too_short")).when(
            F.col("quality_score") < QUALITY_MIN_SCORE, F.lit("low_quality")
        ),
    )


def run_corpus_ingest(
    doc_stream: DataFrame,
    curated_path: str,
    rejected_path: str,
    history_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start the streaming ingest over a document stream (schema:
    doc_id, text, lang, source). Returns the StreamingQuery."""

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        gated = gate_documents(batch_df).persist()
        try:
            rejected = gated.filter(F.col("reject_reason").isNotNull())
            accepted = gated.filter(F.col("reject_reason").isNull())
            # within-batch exact dedup: keep the lowest doc_id per fp
            # (deterministic survivor, same rule as dedup_survivors)
            first = accepted.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
            accepted = accepted.join(first, ["fp", "doc_id"], "left_semi")
            # incremental dedup: anti-join the O(distinct-fp) history
            if os.path.exists(history_path):
                history = spark.read.parquet(history_path).select("fp")
                accepted = accepted.join(history, "fp", "left_anti")
            accepted = accepted.select(
                "doc_id", "text", "lang", "source", "fp"
            ).persist()
            n_new = accepted.count()  # pin before the history append below
            rejected.select(
                "doc_id", "source", "reject_reason"
            ).write.mode("append").parquet(rejected_path)
            if n_new:
                accepted.write.mode("append").parquet(curated_path)
                # history grows ONLY after the curated write succeeded:
                # a retried batch re-runs the anti-join against the
                # updated history and is a no-op (idempotent replay)
                accepted.select("fp").write.mode("append").parquet(history_path)
        finally:
            gated.unpersist()

    writer = (
        doc_stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

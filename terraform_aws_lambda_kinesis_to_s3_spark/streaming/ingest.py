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
``incremental_dedup_check``). foreachBatch is at-least-once on retry,
so idempotency is layered twice:

- curated/ and history/ are written with per-batch OVERWRITE into
  ``run=<token>/batch=N`` subdirectories — a retried batch N inside
  one run replaces its own output instead of appending a second copy,
  and distinct runs (fresh checkpoints renumber batches from 0) can
  never overwrite each other's data;
- documents re-DELIVERED in a later batch (or a replay from a fresh
  checkpoint) are removed by the anti-join against the history
  fingerprints, which is read with recursiveFileLookup so any
  directory nesting (or an older flat layout) is tolerated.

rejected/ is an at-least-once AUDIT LOG (plain append): a replayed
batch may append duplicate reject rows; consumers deduplicate on
(doc_id, reject_reason) if they need exactly-once counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.operators import textops as X


def _hadoop_path_exists(spark, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API, so any
    scheme the cluster can read (s3a://, hdfs://, file:) works — a
    driver-local os.path.exists would silently disable cross-batch
    dedup on object stores."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _run_token(checkpoint: str) -> str:
    """Run identity for monitor state paths, derived from the
    checkpoint location.  A driver restart that recovers from the SAME
    checkpoint (the standard streaming recovery path) must overwrite
    the same ``run=<t>/batch=N`` subdirs so a re-delivered batch is
    absorbed, not double-counted; a replay from a FRESH checkpoint (a
    different location) gets a different token and appends.  Hash of
    the raw location string: scheme-agnostic, no filesystem call."""
    import hashlib

    return hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:12]

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
    metrics: list | None = None,
):
    """Start the streaming ingest over a document stream (schema:
    doc_id, text, lang, source). Returns the StreamingQuery.

    ``metrics``: optional driver-side list; each micro-batch appends
    ``{batch_id, n_in, n_rejected, n_new}`` (the ingest counterpart of
    the routing job's A12 observe() counters — here the counts ride on
    the persisted gated stage, so they cost aggregates over cached
    data, not extra source scans).

    Guarantee ladder (honest accounting — exactly-once across
    arbitrary crash points needs a transactional table format, which
    is the documented production swap):

    - same-run retry of a micro-batch (the common at-least-once case):
      EXACTLY-ONCE — the batch overwrites its own run/batch
      subdirectory;
    - driver restart recovering from the SAME checkpoint: the run
      token is a pure function of the checkpoint location, so the
      re-delivered batch overwrites the same run/batch subdirectory —
      the crashed attempt's partial curated/history writes for that
      batch are replaced, not duplicated (this closes the
      curated-written-history-not-yet window for the recovery path;
      both recovery-path crash points are pinned by
      ``test_restart_same_checkpoint_absorbed`` in
      tests/test_streaming_ingest.py);
    - replay from a FRESH checkpoint (a different location; batch
      numbering restarts): no loss, no duplicates — a different token
      means no directory collision with prior runs, and re-delivered
      docs anti-join away against history;
    - driver death between the curated and history writes followed by
      a NEW process on a NEW checkpoint: that one batch may be curated
      twice (at-least-once). Writing history first would turn the same
      window into data LOSS, which is strictly worse.  The
      ``rejected`` sink is mode("append") and stays at-least-once
      across restarts; consumers dedupe on (batch_id, doc_id).
    """
    run_token = _run_token(checkpoint)

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        gated = gate_documents(batch_df).persist()
        accepted = None
        try:
            rejected = gated.filter(F.col("reject_reason").isNotNull())
            kept = gated.filter(F.col("reject_reason").isNull())
            # within-batch exact dedup: keep the lowest doc_id per fp
            # (deterministic survivor, same rule as dedup_survivors)
            first = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
            kept = kept.join(first, ["fp", "doc_id"], "left_semi")
            # the semi-join keeps EVERY row matching (fp, min doc_id):
            # an at-least-once source can deliver the identical record
            # twice inside one micro-batch — collapse to one survivor
            kept = kept.dropDuplicates(["fp"])
            # incremental dedup: anti-join the O(distinct-fp) history.
            # recursiveFileLookup reads every parquet file regardless of
            # the run/batch directory nesting (and tolerates a mix of
            # flat and nested layouts from older writers).
            if _hadoop_path_exists(spark, history_path):
                history = (
                    spark.read.option("recursiveFileLookup", "true")
                    .parquet(history_path)
                    .select("fp")
                )
                kept = kept.join(history, "fp", "left_anti")
            accepted = kept.select(
                "doc_id", "text", "lang", "source", "fp"
            ).persist()
            n_new = accepted.count()  # pin before the writes below
            rejected.select(
                "doc_id", "source", "reject_reason"
            ).write.mode("append").parquet(rejected_path)
            if n_new:
                subdir = f"run={run_token}/batch={batch_id}"
                accepted.write.mode("overwrite").parquet(
                    f"{curated_path}/{subdir}"
                )
                accepted.select("fp").write.mode("overwrite").parquet(
                    f"{history_path}/{subdir}"
                )
            if metrics is not None:
                # appended AFTER the writes: a batch whose write fails
                # is never recorded. Like the rejected sink, this is
                # at-least-once under retry — consumers dedupe on
                # batch_id (last entry wins)
                metrics.append(
                    {
                        "batch_id": batch_id,
                        "n_in": gated.count(),
                        "n_rejected": rejected.count(),
                        "n_new": n_new,
                    }
                )
        finally:
            gated.unpersist()
            if accepted is not None:
                accepted.unpersist()

    writer = (
        doc_stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Partitioned gzip JSON sink (reference A10, lambda/main.py:67-73).

The reference writes one gzipped JSON-lines object per (log_type,
YYYY-MM, DD) group under ``%prefix%/%log_type%/YYYY-MM/DD/`` with
collision-free names (``README.md:13-14``). Spark equivalents:

- **hive layout (default, idiomatic)**: dynamic-partition write
  ``partitionBy("log_type","ym","dd")`` — no shuffle, each task
  streams its rows straight into the right partition directory, and
  task-attempt file naming already guarantees uniqueness (the
  reference needed ``log_id`` in the object name for that).
- **exact layout (compat)**: the reference's two-segment
  ``%log_type%/YYYY-MM/DD/`` path. Implemented as the same dynamic
  write into a staging dir, then directory renames — metadata-only on
  a filesystem, one COPY per object on S3 (use hive layout there).

Payloads are written verbatim (``text`` writer, gzip codec), so output
content round-trips the input JSON byte-for-byte — the reference never
re-serializes either (schema-free model, README.md:9).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.config import PipelineConfig

_PARTITION_COLS = ("log_type", "ym", "dd")


def _ensure_local(path: str, what: str) -> str:
    """The restage/compact paths use OS-level renames, which only exist
    on a local filesystem. On S3/HDFS a 'rename' is a copy per object —
    raise a clear error instead of failing mid-way (or silently doing
    N full-object copies); on those stores use the hive layout and a
    committer-based rewrite instead."""
    scheme, sep, rest = path.partition("://")
    if sep and scheme != "file":
        raise ValueError(
            f"{what} requires a local filesystem path (got scheme "
            f"'{scheme}://'); on object stores keep the hive layout "
            "(exact_layout=False) or compact via a table rewrite"
        )
    return rest if sep else path


def write_routed(
    df: DataFrame,
    path: str,
    cfg: PipelineConfig | None = None,
    exact_layout: bool = False,
    payload_col: str = "payload",
    mode: str = "append",
    format: str = "text",
    cluster_output: bool = True,
) -> None:
    """Write a routed DataFrame (from ``route_records``) partitioned by
    (log_type, ym, dd).

    ``cluster_output`` (default) hash-repartitions rows onto their
    partition columns before the dynamic write, so each output
    directory receives files from one task instead of every task —
    without it, T tasks x P partitions produces T*P tiny gzip objects
    (the small-files problem at its source). Disable only when the
    input is already clustered by the partition keys.

    ``format="text"`` (default) is reference-compatible gzip JSON-lines
    — payloads verbatim. ``format="parquet"`` is the analytics landing
    variant: typed envelope columns (log_id, ts) beside the raw
    payload, zstd-compressed, ready for predicate/partition pruning by
    downstream queries. ``path`` is the dataset root;
    ``cfg.log_path_prefix`` is appended (reference LOG_S3_PREFIX,
    lambda/main.py:23).
    """
    cfg = cfg or PipelineConfig()
    root = os.path.join(path, cfg.log_path_prefix) if cfg.log_path_prefix else path
    if exact_layout:
        _ensure_local(root, "exact_layout restage")  # fail before writing
    target = root if not exact_layout else root + "__stage"
    if cluster_output:
        n = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(n, F.col("route"), F.col("ym"), F.col("dd"))
    if format == "parquet":
        out = df.select(
            F.col(payload_col).alias("payload"),
            F.col("log_id"),
            F.col("ts"),
            F.col("route").alias("log_type"),
            F.col("ym"),
            F.col("dd"),
        )
        writer = out.write.mode(mode).partitionBy(*_PARTITION_COLS).option(
            "compression", "zstd"
        ).format("parquet")
    else:
        out = df.select(
            F.col(payload_col).alias("value"),
            F.col("route").alias("log_type"),
            F.col("ym"),
            F.col("dd"),
        )
        writer = out.write.mode(mode).partitionBy(*_PARTITION_COLS).option(
            "compression", "gzip"
        ).format("text")
    writer.save(target)
    if exact_layout:
        _restage_exact(target, root)


def _restage_exact(stage: str, root: str) -> None:
    """hive ``log_type=T/ym=M/dd=D`` -> exact ``T/M/D`` (renames only)."""
    stage = _ensure_local(stage, "exact_layout restage")
    root = _ensure_local(root, "exact_layout restage")
    for lt in _hive_children(stage, "log_type="):
        for ym in _hive_children(os.path.join(stage, lt), "ym="):
            for dd in _hive_children(os.path.join(stage, lt, ym), "dd="):
                src = os.path.join(stage, lt, ym, dd)
                dst = os.path.join(
                    root, lt.split("=", 1)[1], ym.split("=", 1)[1], dd.split("=", 1)[1]
                )
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    if not f.startswith(("_", ".")):
                        shutil.move(os.path.join(src, f), os.path.join(dst, f))
    shutil.rmtree(stage, ignore_errors=True)


def _hive_children(d: str, prefix: str) -> list[str]:
    if not os.path.isdir(d):
        return []
    return [c for c in os.listdir(d) if c.startswith(prefix)]


def read_routed(
    spark: SparkSession, path: str, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Read back a hive-layout routed dataset (payload + partition cols)."""
    cfg = cfg or PipelineConfig()
    root = os.path.join(path, cfg.log_path_prefix) if cfg.log_path_prefix else path
    return (
        spark.read.format("text")
        .option("basePath", root)
        .load(root + "/log_type=*/ym=*/dd=*")
        .withColumnRenamed("value", "payload")
    )


def compact_partitions(
    spark: SparkSession,
    root: str,
    files_per_partition: int = 1,
) -> int:
    """Compact a hive-layout routed dataset's small files.

    Partitioned streaming sinks accumulate one file per task per
    micro-batch; at 100 TB that is the classic small-files problem
    (S3 listing + open overhead dominates reads). This rewrites each
    (log_type, ym, dd) partition into ``files_per_partition`` files
    via a repartition-by-partition-columns write to a staging dir,
    then swaps directories. Returns the number of data files after
    compaction.

    The rewrite is one parallel Spark job: hash-repartitioning on the
    partition columns routes each output directory's rows to exactly
    one task (so one file per directory) while different directories
    still spread across all cores. ``files_per_partition > 1`` salts
    the hash to split hot partitions.
    """
    import glob as _glob

    root = _ensure_local(root, "compact_partitions")
    df = (
        spark.read.format("text")
        .option("basePath", root)
        .load(root + "/log_type=*/ym=*/dd=*")
    )
    stage = root + "__compact"
    keys = [F.col(c) for c in _PARTITION_COLS]
    if files_per_partition > 1:
        keys.append(F.crc32(F.col("value")) % files_per_partition)
    n = spark.sparkContext.defaultParallelism
    (
        df.repartition(n, *keys)
        .write.mode("overwrite")
        .partitionBy(*_PARTITION_COLS)
        .option("compression", "gzip")
        .format("text")
        .save(stage)
    )
    old = root + "__old"
    os.rename(root, old)
    os.rename(stage, root)
    shutil.rmtree(old, ignore_errors=True)
    return len(
        [
            f
            for f in _glob.glob(f"{root}/**/*", recursive=True)
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        ]
    )

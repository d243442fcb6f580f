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
  write into a staging dir, then renames through the Hadoop
  FileSystem API — metadata-only on file:// and HDFS, one COPY per
  object on S3A (functional, but prefer the hive layout there).

Payloads are written verbatim (``text`` writer, gzip codec), so output
content round-trips the input JSON byte-for-byte — the reference never
re-serializes either (schema-free model, README.md:9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark.config import PipelineConfig

_PARTITION_COLS = ("log_type", "ym", "dd")


def _jpath(spark: SparkSession, p: str):
    return spark._jvm.org.apache.hadoop.fs.Path(p)


def _fs(spark: SparkSession, path: str, what: str):
    """Resolve the Hadoop FileSystem for ``path`` — local, HDFS, or any
    object-store connector on the classpath. Unknown schemes (e.g.
    ``s3://`` without hadoop-aws deployed) fail here, before any data
    is written."""
    try:
        return _jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())
    except Exception as exc:  # py4j wraps the Java IOException
        raise ValueError(
            f"{what}: no Hadoop FileSystem available for {path!r} "
            f"(is the connector on the classpath?): {exc}"
        ) from None


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
        _fs(df.sparkSession, root, "exact_layout restage")  # fail before writing
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
        _restage_exact(df.sparkSession, target, root)


#: Schemes where a Hadoop FS rename is a true metadata-only move.  On
#: anything else (s3a://, gs://, abfs://, ...) rename is a client-side
#: copy that several connectors also refuse (return False) for
#: cross-directory moves — those go straight to the explicit
#: copy-then-delete below, the portable object-store move.
_RENAME_SCHEMES = frozenset({"", "file", "hdfs", "viewfs"})


def _move_file(spark: SparkSession, fs, src, dst) -> None:
    """Move one object: metadata rename where the filesystem supports
    it, copy-then-delete everywhere else (and as the fallback when a
    rename is refused)."""
    scheme = src.toUri().getScheme() or ""
    if scheme in _RENAME_SCHEMES and fs.rename(src, dst):
        return
    ok = spark._jvm.org.apache.hadoop.fs.FileUtil.copy(
        fs, src, fs, dst, True, True, spark._jsc.hadoopConfiguration()
    )
    if not ok:
        raise OSError(f"exact_layout restage: could not move {src} -> {dst}")


def _restage_exact(spark: SparkSession, stage: str, root: str) -> None:
    """hive ``log_type=T/ym=M/dd=D`` -> exact ``T/M/D`` via
    :func:`_move_file` — metadata-only renames on file://+HDFS, explicit
    copy-then-delete on object stores (S3A et al., whose "rename" is a
    copy anyway and may return False outright). Driver-side loop over
    *directories* (one per partition), never over data rows."""
    fs = _fs(spark, stage, "exact_layout restage")
    for lt in _hive_children(spark, fs, stage, "log_type="):
        for ym in _hive_children(spark, fs, str(lt), "ym="):
            for dd in _hive_children(spark, fs, str(ym), "dd="):
                parts = [
                    seg.split("=", 1)[1]
                    for seg in (p.getName() for p in (lt, ym, dd))
                ]
                dst = _jpath(spark, "/".join([root, *parts]))
                fs.mkdirs(dst)
                for st in fs.listStatus(dd):
                    name = st.getPath().getName()
                    if not name.startswith(("_", ".")):
                        _move_file(
                            spark,
                            fs,
                            st.getPath(),
                            spark._jvm.org.apache.hadoop.fs.Path(dst, name),
                        )
    fs.delete(_jpath(spark, stage), True)


def _hive_children(spark: SparkSession, fs, d: str, prefix: str):
    p = _jpath(spark, str(d))
    if not fs.exists(p):
        return []
    return [
        st.getPath()
        for st in fs.listStatus(p)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    ]


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

    The staging-dir swap goes through the Hadoop FileSystem API —
    atomic directory renames on file://+HDFS; on S3A the swap is a
    copy and readers can observe a partial listing mid-swap (prefer a
    table format's commit protocol there).
    """
    fs = _fs(spark, root, "compact_partitions")
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
    root_p, stage_p, old_p = (_jpath(spark, p) for p in (root, stage, old))
    fs.delete(old_p, True)
    fs.rename(root_p, old_p)
    fs.rename(stage_p, root_p)
    fs.delete(old_p, True)
    n_files = 0
    it = fs.listFiles(root_p, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            n_files += 1
    return n_files

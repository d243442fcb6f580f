"""In-process Kinesis stream emulator (Spark 4 Python DataSource).

The production ``kinesis`` source (``streaming/job.py`` stream_source)
needs a connector jar that EMR/Glue provide; this emulator registers a
Python streaming DataSource under the SAME format name with the
connector's documented schema — ``data`` raw bytes plus
streamName/partitionKey/sequenceNumber/approximateArrivalTimestamp —
so the real ``format("kinesis")`` branch executes end-to-end in dev and
test environments without AWS (reference source seam: ``main.tf:56-62``
event-source mapping; per-shard order and ``starting_position`` are
emulated per the same contract, ``variables.tf:50-53``).

Never auto-registered: call :func:`register_kinesis_emulator` (or rely
on the connector jar in production — the emulator is strictly opt-in).

Semantics emulated:

- ``startingPosition=TRIM_HORIZON`` reads the shard from the oldest
  record; ``LATEST`` starts past the existing records (a drain sees
  nothing until new records arrive — exactly the connector behavior).
- Records arrive in per-shard order with monotonically increasing
  sequence numbers.
- ``data`` is the raw (possibly KPL-aggregated / gzipped / CloudWatch-
  wrapped) blob, NOT base64 text: the connector hands bytes, and the
  decode chain (A2) owns the unwrapping.

The emulated shard is backed by one file per record under a well-known
temp directory (load it with :func:`set_stream_records`): the stream
reader runs inside a separate Python runner process, so in-memory
state set by the calling process would not be visible to it — files
are the only shared channel that needs no extra configuration.
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import tempfile

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_EPOCH = datetime.datetime(2024, 1, 1)

KINESIS_SCHEMA = (
    "data binary, streamName string, partitionKey string, "
    "sequenceNumber string, approximateArrivalTimestamp timestamp"
)


def _stream_dir(stream_name: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), "spark_kinesis_emulator", stream_name
    )


def _shard_dir(stream_name: str, shard: int) -> str:
    return os.path.join(_stream_dir(stream_name), f"shard-{shard}")


def set_stream_records(
    stream_name: str,
    blobs: list[bytes],
    append: bool = False,
    shard: int = 0,
) -> None:
    """(Re)load — or, with ``append``, extend — one shard of the
    emulated stream with raw record blobs. Call once per shard for a
    multi-shard stream (shards map to input partitions, the
    reference's one-Lambda-per-shard parallelism)."""
    if not append and shard == 0:
        shutil.rmtree(_stream_dir(stream_name), ignore_errors=True)
    d = _shard_dir(stream_name, shard)
    if not append:
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    base = len(glob.glob(os.path.join(d, "*.bin"))) if append else 0
    for i, b in enumerate(blobs, start=base):
        with open(os.path.join(d, f"{i:08d}.bin"), "wb") as f:
            f.write(b)


def _shards(stream_name: str) -> list[int]:
    pat = os.path.join(_stream_dir(stream_name), "shard-*")
    out = []
    for p in sorted(glob.glob(pat)):
        try:
            out.append(int(os.path.basename(p).split("-", 1)[1]))
        except ValueError:
            continue
    return out or [0]


def _shard_len(stream_name: str, shard: int) -> int:
    return len(glob.glob(os.path.join(_shard_dir(stream_name, shard), "*.bin")))


def _read_shard(stream_name: str, shard: int, lo: int, hi: int) -> list[bytes]:
    files = sorted(
        glob.glob(os.path.join(_shard_dir(stream_name, shard), "*.bin"))
    )[lo:hi]
    out = []
    for p in files:
        with open(p, "rb") as f:
            out.append(f.read())
    return out


class _ShardSlice(InputPartition):
    """One (shard, seq-range) slice — the executor-side read unit, so
    shard parallelism maps 1:1 to Spark input partitions exactly as
    Kinesis shards map to the reference's per-shard Lambdas."""

    def __init__(self, stream: str, shard: int, lo: int, hi: int):
        self.stream, self.shard, self.lo, self.hi = stream, shard, lo, hi


class _EmulatedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        # DataSource options arrive lower-cased
        self.stream = options.get("streamname", "")
        self._latest_start = (
            (options.get("startingposition") or "TRIM_HORIZON").upper()
            == "LATEST"
        )

    def initialOffset(self):
        # offsets are JSON dicts: shard id (string key) -> next seq
        return {
            str(s): (_shard_len(self.stream, s) if self._latest_start else 0)
            for s in _shards(self.stream)
        }

    def latestOffset(self):
        return {str(s): _shard_len(self.stream, s) for s in _shards(self.stream)}

    def partitions(self, start, end):
        parts = []
        for s, hi in end.items():
            lo = start.get(s, 0)
            if hi > lo:
                parts.append(_ShardSlice(self.stream, int(s), lo, hi))
        # Spark requires >= 1 partition per micro-batch plan
        return parts or [_ShardSlice(self.stream, 0, 0, 0)]

    def read(self, partition: _ShardSlice):
        # executor-side: yield connector-schema tuples for this slice
        blobs = _read_shard(
            partition.stream, partition.shard, partition.lo, partition.hi
        )
        for i, b in enumerate(blobs, start=partition.lo):
            yield (
                b,
                partition.stream,
                f"shard-{partition.shard}",
                str(i),
                _EPOCH,
            )

    def commit(self, end):
        pass  # shard files are immutable; nothing to clean up


class KinesisEmulatorDataSource(DataSource):
    """Registers as ``kinesis`` so the production branch runs verbatim."""

    @classmethod
    def name(cls) -> str:
        return "kinesis"

    def schema(self) -> str:
        return KINESIS_SCHEMA

    def streamReader(self, schema):  # noqa: ARG002 — fixed schema
        return _EmulatedStreamReader(dict(self.options))


def register_kinesis_emulator(spark) -> None:
    """Opt-in registration of the emulator under the ``kinesis`` format."""
    spark.dataSource.register(KinesisEmulatorDataSource)

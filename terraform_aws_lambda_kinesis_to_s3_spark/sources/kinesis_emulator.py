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

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_EPOCH = datetime.datetime(2024, 1, 1)

KINESIS_SCHEMA = (
    "data binary, streamName string, partitionKey string, "
    "sequenceNumber string, approximateArrivalTimestamp timestamp"
)


def _shard_dir(stream_name: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), "spark_kinesis_emulator", stream_name
    )


def set_stream_records(
    stream_name: str, blobs: list[bytes], append: bool = False
) -> None:
    """(Re)load — or, with ``append``, extend — the emulated
    single-shard stream with raw record blobs."""
    d = _shard_dir(stream_name)
    if not append:
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    base = len(glob.glob(os.path.join(d, "*.bin"))) if append else 0
    for i, b in enumerate(blobs, start=base):
        with open(os.path.join(d, f"{i:08d}.bin"), "wb") as f:
            f.write(b)


def _read_shard(stream_name: str) -> list[bytes]:
    files = sorted(glob.glob(os.path.join(_shard_dir(stream_name), "*.bin")))
    out = []
    for p in files:
        with open(p, "rb") as f:
            out.append(f.read())
    return out


class _EmulatedShardReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        # DataSource options arrive lower-cased
        self.stream = options.get("streamname", "")
        start = (options.get("startingposition") or "TRIM_HORIZON").upper()
        self._start0 = (
            len(_read_shard(self.stream)) if start == "LATEST" else 0
        )

    def initialOffset(self):
        return {"seq": self._start0}

    def _rows(self, blobs: list[bytes], lo: int, hi: int):
        # must be a concrete (picklable) sequence — the runner pickles
        # prefetched rows for replay; generators can't be pickled
        return [
            (b, self.stream, "shard-0", str(i), _EPOCH)
            for i, b in enumerate(blobs[lo:hi], start=lo)
        ]

    def read(self, start):
        blobs = _read_shard(self.stream)
        lo = start["seq"]
        # iter(): the runner wants an iterator over picklable rows
        return iter(self._rows(blobs, lo, len(blobs))), {"seq": len(blobs)}

    def readBetweenOffsets(self, start, end):
        return iter(
            self._rows(_read_shard(self.stream), start["seq"], end["seq"])
        )


class KinesisEmulatorDataSource(DataSource):
    """Registers as ``kinesis`` so the production branch runs verbatim."""

    @classmethod
    def name(cls) -> str:
        return "kinesis"

    def schema(self) -> str:
        return KINESIS_SCHEMA

    def simpleStreamReader(self, schema):  # noqa: ARG002 — fixed schema
        return _EmulatedShardReader(dict(self.options))


def register_kinesis_emulator(spark) -> None:
    """Opt-in registration of the emulator under the ``kinesis`` format."""
    spark.dataSource.register(KinesisEmulatorDataSource)

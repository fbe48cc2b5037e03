"""Custom connector via the PySpark 4 Python DataSource API: a
"wiredump" format — length-prefixed wire frames (the engine's message
codec, codec.py) in flat segment files, i.e. the on-disk shape of a
dumped Kafka topic segment.

Why this exists: the reference's ecosystem moves data as wire-framed
messages (MessageSerializer); an operator handed a raw dump of those
frames needs a TABLE over them without a JVM reader for the format.
Spark 4's Python DataSource API is exactly that extension point —
`spark.read.format("wiredump").load(dir)` after one register() call,
with partition-parallel reads (one input partition per segment file)
and a full writer (`df.write.format("wiredump")`) whose commit protocol
is task-temp-file + rename-on-commit.

File format (this module defines it; decode_py/encode_py define the
frame): repeated records of

    [4-byte big-endian frame length][frame bytes]

where frame = codec.encode_py(headers, payload). Malformed tails
(truncated final record) raise — a dump segment is immutable and
complete by contract.

Scale shape: parallelism == segment files (the natural unit a broker
dump produces); each task streams one file sequentially — no seeks, no
whole-file buffering. The Python-side decode is the price of a
JVM-less format reader; rows cross into the JVM via Arrow batches. For
formats Spark CAN read natively, the native path always wins — this
API is for the ones it can't.
"""

from __future__ import annotations

import glob
import os
import struct
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

WIREDUMP_SCHEMA = StructType(
    [
        StructField("headers", MapType(StringType(), ArrayType(StringType()))),
        StructField("payload", BinaryType()),
        StructField("_file", StringType()),
        StructField("_pos", LongType()),
    ]
)


@dataclass
class _FilePartition(InputPartition):
    path: str


class WireDumpReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wiredump: 'path' option/load(path) is required")

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.wiredump")))
        if not files:
            raise FileNotFoundError(f"wiredump: no *.wiredump segments in {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        from ..codec import decode_py

        fname = os.path.basename(partition.path)
        with open(partition.path, "rb") as f:
            pos = 0
            while True:
                head = f.read(4)
                if not head:
                    break
                if len(head) < 4:
                    raise EOFError(f"{fname}: truncated length prefix at {pos}")
                (n,) = struct.unpack(">I", head)
                frame = f.read(n)
                if len(frame) < n:
                    raise EOFError(f"{fname}: truncated frame at {pos}")
                headers, payload = decode_py(frame)
                yield (headers, payload, fname, pos)
                pos += 1


@dataclass
class _SegmentCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str


class WireDumpWriter(DataSourceWriter):
    """One segment file per task, written to a temp name and renamed on
    driver-side commit — tasks that fail or are speculated leave only
    temp files, which abort() removes; readers never see partial
    segments (the same temp+rename protocol as Hadoop committers)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wiredump: 'path' option/save(path) is required")
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _SegmentCommit:
        from ..codec import encode_py

        seg = uuid.uuid4().hex[:12]
        tmp = os.path.join(self.path, f"_tmp_{seg}")
        with open(tmp, "wb") as f:
            for row in iterator:
                headers = row.headers or {}
                # Row gives MapType as dict[str, list[str]]
                frame = encode_py(
                    {k: list(v) for k, v in headers.items()}, bytes(row.payload)
                )
                f.write(struct.pack(">I", len(frame)))
                f.write(frame)
        return _SegmentCommit(tmp_path=tmp, final_path="")

    def commit(self, messages):
        # Final names are assigned HERE, driver-side, from a monotonic
        # timestamp + sequence — so segments committed later always sort
        # AFTER earlier ones (Kafka's base-offset-in-the-name pattern).
        # The streaming reader's count-of-segments offset is only sound
        # over an append-ONLY sorted list; task-side random names broke
        # that (a later segment could sort before consumed ones and be
        # skipped forever — caught by the sf0.001 oracle in round 6).
        import time as _time

        base = _time.time_ns()
        for i, m in enumerate(sorted(messages, key=lambda m: m.tmp_path)):
            final = os.path.join(self.path, f"part-{base:020d}-{i:05d}.wiredump")
            os.replace(m.tmp_path, final)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class WireDumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wiredump"

    def schema(self):
        return WIREDUMP_SCHEMA

    def reader(self, schema):
        return WireDumpReader(self.options)

    def writer(self, schema, overwrite: bool):
        return WireDumpWriter(self.options)

    def simpleStreamReader(self, schema):
        return WireDumpStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return WireDumpStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the wiredump format on a session."""
    spark.dataSource.register(WireDumpDataSource)


# ---------------------------------------------------------------------------
# Streaming source (simpleStreamReader)
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class WireDumpStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of a wiredump directory: the offset is the count
    of consumed segments over the SORTED segment list — segments are
    immutable and append-only (broker-dump semantics), so `count`
    totally orders progress and `readBetweenOffsets` can replay any
    committed range deterministically for exactly-once recovery (the
    engine re-reads a batch's exact segment slice after a crash instead
    of trusting the first read).

    Scale note: the simple-reader API reads on the DRIVER — right for
    segment-at-a-time tailing of an ingest directory; bulk history
    loads belong to the partition-parallel batch reader above
    (one InputPartition per segment).
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wiredump: 'path' option is required")

    def _segments(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "*.wiredump")))

    def initialOffset(self) -> dict:
        return {"count": 0}

    def _frames_of(self, path: str):
        from ..codec import decode_py

        fname = os.path.basename(path)
        with open(path, "rb") as f:
            pos = 0
            while True:
                head = f.read(4)
                if not head:
                    break
                if len(head) < 4:
                    raise EOFError(f"{fname}: truncated length prefix")
                (n,) = struct.unpack(">I", head)
                frame = f.read(n)
                if len(frame) < n:
                    raise EOFError(f"{fname}: truncated frame")
                headers, payload = decode_py(frame)
                yield (headers, payload, fname, pos)
                pos += 1

    def read(self, start: dict):
        segs = self._segments()
        done = int(start.get("count", 0))
        # materialized list, not a generator: the runtime pickles the
        # returned rows to prefetch the batch; one batch == the newly
        # arrived segments, bounded by ingest cadence
        rows = [r for p in segs[done:] for r in self._frames_of(p)]
        return iter(rows), {"count": len(segs)}

    def readBetweenOffsets(self, start: dict, end: dict):
        segs = self._segments()
        return iter(
            [
                r
                for p in segs[int(start.get("count", 0)) : int(end.get("count", 0))]
                for r in self._frames_of(p)
            ]
        )

    def commit(self, end: dict) -> None:
        pass  # segments are immutable; nothing to clean up


# ---------------------------------------------------------------------------
# Streaming sink (streamWriter)
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamWriter  # noqa: E402


class WireDumpStreamWriter(DataSourceStreamWriter):
    """Exactly-once streaming sink: each epoch's task segments are
    written to temp files and renamed AT COMMIT to
    ``part-e{batchId:010d}-{seq}.wiredump`` — deterministic per-epoch
    names, so a REPLAYED epoch (crash after data write, before the
    engine records the commit) rewrites the same final names via
    os.replace instead of appending duplicates: idempotent-overwrite
    exactly-once, the same protocol family as eos.EpochIdempotentWriter.
    Epoch-numbered names also keep the batch/stream readers' sorted
    order append-only (epochs are monotone).
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wiredump: 'path' option/save(path) is required")
        os.makedirs(self.path, exist_ok=True)

    # task-side: same temp-segment protocol as the batch writer
    write = WireDumpWriter.write

    def commit(self, messages, batchId: int) -> None:
        for i, m in enumerate(sorted((m for m in messages if m), key=lambda m: m.tmp_path)):
            final = os.path.join(
                self.path, f"part-e{int(batchId):010d}-{i:05d}.wiredump"
            )
            os.replace(m.tmp_path, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)

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
whole-file buffering. Rows cross the Python->JVM boundary as ARROW
RECORD BATCHES on every path (batch read, batch write, stream read,
stream write — DataSourceArrowWriter / RecordBatch-yielding readers),
never as per-row pickled tuples: measured 2-3x on the sf0.1 replay
(per-row pickling dominated; the codec itself is ~0.5 s/100k frames).
The streaming source is the partition-parallel DataSourceStreamReader
(one InputPartition per newly arrived segment, decoded executor-side) —
the driver only globs the directory and plans offsets, so ingest scales
with executors, not with the driver's Python loop. For formats Spark
CAN read natively, the native path always wins — this API is for the
ones it can't.
"""

from __future__ import annotations

import glob
import os
import struct
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
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

_ARROW_CHUNK_ROWS = 16384


def _decode_segment_batches(path: str, chunk_rows: int = _ARROW_CHUNK_ROWS):
    """Decode one segment file into Arrow RecordBatches matching
    WIREDUMP_SCHEMA — the shared hot path of the batch reader and the
    streaming reader. Truncated tails raise (immutable-segment
    contract)."""
    import pyarrow as pa

    from ..codec import decode_py

    map_t = pa.map_(pa.string(), pa.list_(pa.string()))
    fname = os.path.basename(path)

    def flush(headers: list, payloads: list, first_pos: int):
        n = len(payloads)
        return pa.RecordBatch.from_arrays(
            [
                pa.array(headers, type=map_t),
                pa.array(payloads, type=pa.binary()),
                pa.array([fname] * n, type=pa.string()),
                pa.array(range(first_pos, first_pos + n), type=pa.int64()),
            ],
            names=["headers", "payload", "_file", "_pos"],
        )

    headers: list = []
    payloads: list = []
    pos = 0
    with open(path, "rb") as f:
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
            h, payload = decode_py(frame)
            headers.append(h)
            payloads.append(payload)
            pos += 1
            if len(payloads) >= chunk_rows:
                yield flush(headers, payloads, pos - len(payloads))
                headers, payloads = [], []
    if payloads:
        yield flush(headers, payloads, pos - len(payloads))


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
        yield from _decode_segment_batches(partition.path)


@dataclass
class _SegmentCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str


def _write_segment_arrow(path: str, iterator) -> _SegmentCommit:
    """Task-side write of one temp segment from Arrow RecordBatches
    (shared by the batch and streaming writers). Column lookup is by
    NAME so projection order never matters; headers arrive as Arrow map
    values (lists of (key, value) tuples via to_pylist)."""
    from ..codec import encode_py

    seg = uuid.uuid4().hex[:12]
    tmp = os.path.join(path, f"_tmp_{seg}")
    with open(tmp, "wb") as f:
        for batch in iterator:
            i_h = batch.schema.get_field_index("headers")
            i_p = batch.schema.get_field_index("payload")
            hs = batch.column(i_h).to_pylist()
            ps = batch.column(i_p).to_pylist()
            for h, p in zip(hs, ps):
                if h is None:
                    hd = {}
                elif isinstance(h, dict):
                    hd = {k: list(v) for k, v in h.items()}
                else:  # Arrow map scalar -> list of (key, value) tuples
                    hd = {k: list(v) for k, v in h}
                if p is None:
                    # Fail loud on NULL payloads (matching the pre-Arrow
                    # row writer): the wire format has no null marker, so
                    # a silent b"" coercion would make NULL round-trip as
                    # empty binary and corrupt downstream equality checks.
                    raise ValueError(
                        "wiredump: NULL payload is not encodable (the wire "
                        "format has no null marker); filter or coalesce "
                        "payloads before writing"
                    )
                frame = encode_py(hd, bytes(p))
                f.write(struct.pack(">I", len(frame)))
                f.write(frame)
    return _SegmentCommit(tmp_path=tmp, final_path="")


class WireDumpWriter(DataSourceArrowWriter):
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
        return _write_segment_arrow(self.path, iterator)

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

    def streamReader(self, schema):
        return WireDumpStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return WireDumpStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the wiredump format on a session."""
    spark.dataSource.register(WireDumpDataSource)


# ---------------------------------------------------------------------------
# Streaming source (partition-parallel DataSourceStreamReader)
# ---------------------------------------------------------------------------


class WireDumpStreamReader(DataSourceStreamReader):
    """Streaming tail of a wiredump directory: the offset is the count
    of consumed segments over the SORTED segment list — segments are
    immutable and append-only (broker-dump semantics; the writers'
    commit protocols guarantee monotone names), so `count` totally
    orders progress and any committed offset range replays
    deterministically after a crash (partitions(start, end) re-plans the
    exact segment slice — exactly-once recovery without trusting the
    first read).

    Scale note: this is the FULL stream-reader API, not the driver-side
    simple reader — each newly arrived segment becomes one
    InputPartition decoded executor-side as Arrow batches, so a burst of
    segments fans out across the cluster; the driver's per-batch work is
    one directory glob. (The simple reader pickled every row through the
    driver — measured 2x slower at sf0.1 and serial by construction.)
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wiredump: 'path' option is required")

    def _segments(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "*.wiredump")))

    def initialOffset(self) -> dict:
        return {"count": 0}

    def latestOffset(self) -> dict:
        return {"count": len(self._segments())}

    def partitions(self, start: dict, end: dict):
        segs = self._segments()
        return [
            _FilePartition(p)
            for p in segs[int(start.get("count", 0)) : int(end.get("count", 0))]
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _decode_segment_batches(partition.path)

    def commit(self, end: dict) -> None:
        pass  # segments are immutable; nothing to clean up


# ---------------------------------------------------------------------------
# Streaming sink (streamWriter)
# ---------------------------------------------------------------------------


class WireDumpStreamWriter(DataSourceStreamArrowWriter):
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

    def write(self, iterator) -> _SegmentCommit:
        return _write_segment_arrow(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        for i, m in enumerate(
            sorted((m for m in messages if m), key=lambda m: m.tmp_path)
        ):
            final = os.path.join(
                self.path, f"part-e{int(batchId):010d}-{i:05d}.wiredump"
            )
            os.replace(m.tmp_path, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)

"""The reference Message framing codec, Spark-native.

Wire format (re-derived from the reference's behavior —
MessageDeserializer.java:49-70 / MessageSerializer.java:42-74, see
SURVEY.md §1.2):

    byte 0        : 0xff start marker
    byte 1        : header count (signed byte => <= 127 headers)
    per header    : 1 length byte, name bytes (<= 127),
                    4-byte big-endian value-blob length,
                    value blob = JSON array of strings (UTF-8)
    rest          : opaque payload bytes

The codec runs as Arrow-batched pandas UDFs (`encode_message` /
`decode_message`) so the per-record Python cost is amortized per batch; the
pure-Python `encode_py` / `decode_py` pair is the single source of truth
and what the unit tests golden-check against the reference's round-trip
test (MessageSerializerTests.java:37-49).
"""

from __future__ import annotations

import json
import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import MESSAGE_SCHEMA

__all__ = ["encode_py", "decode_py", "encode_message", "decode_message"]


def encode_py(headers: dict[str, list[str]] | None, payload: bytes | None) -> bytes:
    """Message -> wire bytes (mirror of MessageSerializer.java:42-74)."""
    headers = headers or {}
    payload = payload or b""
    if len(headers) > 127:
        raise ValueError(f"too many headers ({len(headers)} > 127)")
    out = bytearray()
    out.append(0xFF)
    out.append(len(headers))
    for name, values in headers.items():
        name_b = name.encode("utf-8")
        if len(name_b) > 127:
            raise ValueError(f"header name too long ({len(name_b)} > 127): {name!r}")
        # JSON array of strings, compact separators (no spaces) to match the
        # reference's Gson output
        blob = json.dumps(list(values), separators=(",", ":"), ensure_ascii=False).encode("utf-8")
        out.append(len(name_b))
        out += name_b
        out += struct.pack(">i", len(blob))
        out += blob
    out += payload
    return bytes(out)


def decode_py(data: bytes) -> tuple[dict[str, list[str]], bytes]:
    """Wire bytes -> (headers, payload) (mirror of MessageDeserializer.java:49-70)."""
    if not data or data[0] != 0xFF:
        raise ValueError("bad wire format: missing 0xff start marker")
    n_headers = data[1]
    pos = 2
    headers: dict[str, list[str]] = {}
    for _ in range(n_headers):
        name_len = data[pos]
        pos += 1
        name = data[pos : pos + name_len].decode("utf-8")
        pos += name_len
        (blob_len,) = struct.unpack(">i", data[pos : pos + 4])
        pos += 4
        values = json.loads(data[pos : pos + blob_len].decode("utf-8"))
        pos += blob_len
        headers[name] = [str(v) for v in values]
    return headers, data[pos:]


@F.pandas_udf(T.BinaryType())
def encode_message(msg: pd.DataFrame) -> pd.Series:
    """struct<headers map<string,array<string>>, payload binary> -> binary."""
    return pd.Series(
        [encode_py(h, p) for h, p in zip(msg["headers"], msg["payload"])]
    )


@F.pandas_udf(MESSAGE_SCHEMA)
def decode_message(value: pd.Series) -> pd.DataFrame:
    """binary (wire format) -> struct<headers, payload>."""
    headers, payloads = [], []
    for data in value:
        h, p = decode_py(bytes(data))
        headers.append(h)
        payloads.append(p)
    return pd.DataFrame({"headers": headers, "payload": payloads})


def message_struct(headers: Column, payload: Column) -> Column:
    """Build a Message struct column from headers + payload columns."""
    return F.struct(headers.alias("headers"), payload.alias("payload"))

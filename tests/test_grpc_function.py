"""Tests for the riff function-gRPC protocol (grpc_function.py).

The protobuf wire codec is pure Python and tests everywhere; the live
bidirectional-call test needs ``grpcio`` and skips in containers without
it (the call path is exercised end-to-end wherever grpcio exists).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_service_spark.grpc_function import (
    GRPC_METHOD,
    pb_decode_message,
    pb_encode_message,
)


def test_pb_golden_wire_bytes():
    """Hand-computed proto3 wire bytes for a known Message — pins the
    encoding against the public spec, not just our own round-trip:
    payload is field 1 (tag 0x0A), each headers map entry is field 2
    (tag 0x12) wrapping key (1) and HeaderValue (2) whose values repeat
    as field 1."""
    wire = pb_encode_message({"k": ["a", "bc"]}, b"\x01\x02")
    expected = bytes(
        [
            0x0A, 0x02, 0x01, 0x02,  # payload: field 1, len 2
            0x12, 0x0C,  # map entry: field 2, len 12
            0x0A, 0x01, ord("k"),  # key: field 1, "k"
            0x12, 0x07,  # HeaderValue: field 2, len 7
            0x0A, 0x01, ord("a"),  # values[0] = "a"
            0x0A, 0x02, ord("b"), ord("c"),  # values[1] = "bc"
        ]
    )
    assert wire == expected
    assert pb_decode_message(expected) == ({"k": ["a", "bc"]}, b"\x01\x02")


def test_pb_empty_message_is_empty_bytes():
    # proto3: default-valued fields are omitted entirely
    assert pb_encode_message({}, b"") == b""
    assert pb_encode_message(None, None) == b""
    assert pb_decode_message(b"") == ({}, b"")


def test_pb_unknown_fields_skipped():
    # a future server may add fields; decoder must skip varint/len/fixed
    wire = pb_encode_message({"h": ["v"]}, b"xyz")
    extra = bytes([0x18, 0x2A])  # field 3, varint 42
    extra += bytes([0x25, 1, 2, 3, 4])  # field 4, fixed32
    extra += bytes([0x2A, 0x02, 0xFF, 0xFE])  # field 5, len-delimited
    headers, payload = pb_decode_message(wire + extra)
    assert headers == {"h": ["v"]}
    assert payload == b"xyz"


@settings(max_examples=200, deadline=None)
@given(
    headers=st.dictionaries(
        st.text(min_size=0, max_size=20),
        st.lists(st.text(max_size=50), max_size=4),
        max_size=5,
    ),
    payload=st.binary(max_size=500),
)
def test_pb_roundtrip_property(headers, payload):
    got_h, got_p = pb_decode_message(pb_encode_message(headers, payload))
    # proto3 cannot distinguish absent from empty: an entry with no values
    # under an empty key decodes as the default entry
    expect = dict(headers)
    assert got_p == payload
    assert got_h == expect


def _has_grpc() -> bool:
    try:
        import grpc  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_grpc(),
    reason="grpcio not in this container; the live bidi-call path is "
    "exercised wherever it is installed",
)
def test_remote_function_roundtrip_against_fake_server():
    """End-to-end: an in-process generic gRPC server speaking the riff
    Call method; RemoteFunction must stream a batch through it preserving
    order (1-in-1-out) and surface the transformed headers/payloads."""
    from concurrent import futures

    import grpc
    import pandas as pd

    from kafka_stream_service_spark.grpc_function import pb_decode_message as dec
    from kafka_stream_service_spark.grpc_function import pb_encode_message as enc
    from kafka_stream_service_spark.transform import FunctionConfig, RemoteFunction

    def upper_behavior(request_iterator, context):
        for raw in request_iterator:
            headers, payload = dec(raw)
            headers = {**headers, "seen": ["1"]}
            yield enc(headers, payload.decode("utf-8").upper().encode("utf-8"))

    method = GRPC_METHOD.strip("/").split("/")
    handler = grpc.method_handlers_generic_handler(
        method[0],
        {
            method[1]: grpc.stream_stream_rpc_method_handler(
                upper_behavior,
                request_deserializer=lambda b: b,
                response_serializer=lambda b: b,
            )
        },
    )
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=2))
    server.add_generic_rpc_handlers((handler,))
    port = server.add_insecure_port("localhost:0")
    server.start()
    try:
        fn = RemoteFunction(FunctionConfig(host="localhost", port=port))
        batch = pd.DataFrame(
            {
                "headers": [{"id": [str(i)]} for i in range(5)],
                "payload": [f"msg-{i}".encode() for i in range(5)],
            }
        )
        out = fn(batch)
        fn.close()
        assert list(out["payload"]) == [f"MSG-{i}".encode() for i in range(5)]
        for i, h in enumerate(out["headers"]):
            assert h["id"] == [str(i)]  # order preserved
            assert h["seen"] == ["1"]
    finally:
        server.stop(0)

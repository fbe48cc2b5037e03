"""The R8 live leg WITHOUT grpcio: a real loopback TCP hop speaking the
public gRPC wire format (HTTP/2 + HPACK + length-prefixed messages) via
the stdlib transport (h2grpc.py).

Round 5 left "live gRPC leg needs grpcio" as environment-blocked; these
tests remove the block by implementing the transport subset both ends
need. The grpcio-gated test remains for containers that have it — same
behavior, different transport stack.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kafka_stream_service_spark.grpc_function import (
    GRPC_METHOD,
    call_stream,
    pb_decode_message,
    pb_encode_message,
)
from kafka_stream_service_spark.h2grpc import (
    H2GrpcChannel,
    H2GrpcServer,
    HpackDecoder,
    _huffman_decode,
    hpack_encode,
)
from kafka_stream_service_spark.transform import FunctionConfig, RemoteFunction


def _upper_handler(request_iterator):
    for raw in request_iterator:
        headers, payload = pb_decode_message(raw)
        headers = {**headers, "seen": ["1"]}
        yield pb_encode_message(headers, payload.decode("utf-8").upper().encode("utf-8"))


@pytest.fixture()
def server():
    srv = H2GrpcServer(_upper_handler)
    yield srv
    srv.close()


# ----------------------------------------------------------------- hpack


def test_hpack_roundtrip_and_static_table():
    dec = HpackDecoder()
    hdrs = [(":method", "POST"), (":path", GRPC_METHOD), ("content-type", "application/grpc")]
    assert dec.decode(hpack_encode(hdrs)) == hdrs
    # indexed static entries: 2 = :method GET, 8 = :status 200
    assert dec.decode(bytes([0x82, 0x88])) == [(":method", "GET"), (":status", "200")]
    # literal WITH incremental indexing populates the dynamic table,
    # and index 62 then resolves to it
    frag = bytes([0x40, 3]) + b"abc" + bytes([3]) + b"xyz"
    assert dec.decode(frag) == [("abc", "xyz")]
    assert dec.decode(bytes([0x80 | 62])) == [("abc", "xyz")]


def test_huffman_decode_rfc_examples():
    # RFC 7541 C.4.1: "www.example.com"
    data = bytes.fromhex("f1e3c2e5f23a6ba0ab90f4ff")
    assert _huffman_decode(data) == b"www.example.com"
    # C.6.1: "Mon, 21 Oct 2013 20:13:21 GMT"
    data = bytes.fromhex("d07abe941054d444a8200595040b8166e082a62d1bff")
    assert _huffman_decode(data) == b"Mon, 21 Oct 2013 20:13:21 GMT"


# ------------------------------------------------------------- transport


def test_bidi_call_roundtrip_over_tcp(server):
    chan = H2GrpcChannel("127.0.0.1", server.port)
    try:
        msgs = [({"id": [str(i)]}, f"msg-{i}".encode()) for i in range(7)]
        out = list(call_stream(chan, msgs))
        assert [p for _, p in out] == [f"MSG-{i}".encode() for i in range(7)]
        for i, (h, _) in enumerate(out):
            assert h["id"] == [str(i)] and h["seen"] == ["1"]
    finally:
        chan.close()


def test_multiple_calls_reuse_connection(server):
    chan = H2GrpcChannel("127.0.0.1", server.port)
    try:
        for batch in (3, 1, 5):
            msgs = [({}, f"b{batch}-{i}".encode()) for i in range(batch)]
            out = list(call_stream(chan, msgs))
            assert [p for _, p in out] == [f"B{batch}-{i}".encode() for i in range(batch)]
    finally:
        chan.close()


def test_large_payload_spans_frames(server):
    """A payload > the 16 KB HTTP/2 max frame size must chunk across
    DATA frames and reassemble through the gRPC length prefix."""
    chan = H2GrpcChannel("127.0.0.1", server.port)
    try:
        big = (b"abcdefgh" * 8192) + b"tail"  # 64 KB + 4
        ((_, payload),) = list(call_stream(chan, [({}, big)]))
        assert payload == big.upper()
    finally:
        chan.close()


def test_handler_error_surfaces_as_grpc_status(server):
    def boom(request_iterator):
        next(request_iterator)
        raise RuntimeError("kaput")
        yield  # pragma: no cover

    srv = H2GrpcServer(boom)
    try:
        chan = H2GrpcChannel("127.0.0.1", srv.port)
        with pytest.raises(ConnectionError, match="grpc-status 2"):
            list(call_stream(chan, [({}, b"x")]))
        chan.close()
    finally:
        srv.close()


def test_empty_stream_yields_no_responses(server):
    chan = H2GrpcChannel("127.0.0.1", server.port)
    try:
        assert list(call_stream(chan, [])) == []
    finally:
        chan.close()


# --------------------------------------------------------- RemoteFunction


def test_remote_function_live_leg_stdlib_transport(server):
    """The full R8 slot against a live server: RemoteFunction with
    transport='h2-stdlib' streams a batch through a real TCP hop,
    preserving 1-in-1-out order — the exact test that was grpcio-gated,
    now dependency-free."""
    fn = RemoteFunction(
        FunctionConfig(host="127.0.0.1", port=server.port, transport="h2-stdlib")
    )
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
        assert h["id"] == [str(i)] and h["seen"] == ["1"]


def test_remote_function_pipeline_parity_over_live_hop(spark, server):
    """End-to-end through Spark: the mapInPandas transform stage calls
    the live function server from executor tasks and must equal the
    in-process uppercase path byte-for-byte."""
    from kafka_stream_service_spark.transform import transform_messages, uppercase_function

    rows = [({"k": ["v"]}, f"record {i} MiXeD".encode()) for i in range(20)]
    df = spark.createDataFrame(rows, "headers map<string,array<string>>, payload binary")
    port = server.port
    remote = RemoteFunction(FunctionConfig(host="127.0.0.1", port=port, transport="h2-stdlib"))
    got = sorted(
        bytes(r.payload)
        for r in transform_messages(df, remote).collect()
    )
    expect = sorted(
        bytes(r.payload) for r in transform_messages(df, uppercase_function).collect()
    )
    assert got == expect


def test_streaming_pipeline_with_live_remote_function(spark, server, tmp_path):
    """The REFERENCE ARCHITECTURE end-to-end, in-container: file-stream
    source -> wire decode -> per-record function hosted in an EXTERNAL
    server reached over a real gRPC/HTTP-2 TCP hop -> wire encode ->
    memory sink. This is the full R1-R17 spine with the R8 leg live
    (StreamsApplication.java:179-190), previously possible only where
    grpcio was installed."""
    from kafka_stream_service_spark.codec import decode_py, encode_py
    from kafka_stream_service_spark.pipeline import PipelineConfig, start_pipeline

    messages = [
        ({"Accept": ["*/*"]}, b"World"),
        ({}, b"hello spark"),
        ({"x": ["1", "2"]}, b"MiXeD CaSe 123"),
    ]
    frames = spark.createDataFrame(
        [(None, bytearray(encode_py(h, p))) for h, p in messages],
        "key binary, value binary",
    )
    src = tmp_path / "in"
    frames.write.parquet(str(src))
    cfg = PipelineConfig(
        source="files",
        sink="memory",
        source_path=str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="h2_live_pipe",
        function=FunctionConfig(host="127.0.0.1", port=server.port, transport="h2-stdlib"),
    )
    remote = RemoteFunction(cfg.function)
    q = start_pipeline(spark, cfg, remote)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        decode_py(bytes(r.value))[1] for r in spark.table("h2_live_pipe").collect()
    )
    assert got == sorted(p.decode().upper().encode() for _, p in messages)

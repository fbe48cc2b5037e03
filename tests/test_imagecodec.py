"""Pure-stdlib PNG codec + box resize (operators/imagecodec.py).

The end-to-end pixel math is also hash-verified by the driver via the
q_multimodal_decode / q_multimodal_resize oracles; these tests pin the
codec internals that an aggregate checksum could miss (per-filter-type
round-trips, corruption detection, exact block means).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_service_spark.operators.imagecodec import (
    box_resize,
    decode_png,
    encode_png,
    synth_pixels,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(12, 16), (24, 32, 3), (1, 1), (3, 5, 3)])
def test_roundtrip_each_filter(filter_type, shape):
    rng = np.random.default_rng(hash((filter_type, shape)) % 2**31)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_png(px, filter_for_row=lambda y: filter_type)
    dec = decode_png(data)
    assert dec.shape == px.shape
    assert (dec == px).all()


def test_roundtrip_mixed_filters_multi_idat():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (40, 33, 3), dtype=np.uint8)
    # 64-byte IDAT chunks force the decoder's multi-IDAT concat path.
    data = encode_png(px, idat_chunk_size=64)
    assert data.count(b"IDAT") > 1
    assert (decode_png(data) == px).all()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    rgb=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w, h, rgb, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


def test_crc_corruption_detected():
    px = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_png(px))
    # flip one byte inside the first IDAT body
    idat_at = data.find(b"IDAT")
    data[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_bad_signature_and_truncation():
    px = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png(px)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + good[4:])
    with pytest.raises(ValueError):
        decode_png(good[:-8])  # IEND cut off


def test_unsupported_shapes_guarded():
    # 16-bit depth PNG header should be rejected, not mis-decoded.
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = zlib.compress(b"\x00" * (4 * (4 * 2 + 1)))
    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(data)
    with pytest.raises(NotImplementedError):
        encode_png(np.zeros((4, 4, 4), dtype=np.uint8))  # RGBA not in scope


def test_box_resize_exact_block_means():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (13, 18, 3), dtype=np.uint8)
    out = box_resize(px, 4)
    assert out.shape == (3, 4, 3)
    for r in range(3):
        for c in range(4):
            for ch in range(3):
                blk = px[4 * r : 4 * r + 4, 4 * c : 4 * c + 4, ch].astype(int)
                assert out[r, c, ch] == blk.sum() // 16
    # grayscale path + too-small guard
    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    assert box_resize(g, 4).shape == (2, 2)
    with pytest.raises(ValueError, match="too small"):
        box_resize(g, 16)


def test_synth_pixels_matches_sql_definition():
    payload = b"abcdefghij"
    for doc_id in (0, 7, 15, 22):
        px = synth_pixels(payload, doc_id)
        w, h = 16 + doc_id % 17, 12 + doc_id % 13
        c = 1 if doc_id % 2 == 0 else 3
        assert px.shape == ((h, w) if c == 1 else (h, w, 3))
        flat = px.reshape(-1)
        for j in (0, 1, len(flat) - 1):
            assert flat[j] == payload[j % len(payload)]
    with pytest.raises(ValueError, match="empty"):
        synth_pixels(b"", 1)

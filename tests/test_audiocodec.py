"""Pure-stdlib WAV codec (operators/audiocodec.py).

The end-to-end sample math is also hash-verified by the driver via the
q_audio_decode / q_audio_frame_energy oracles; these tests pin the
container internals an aggregate checksum could miss (chunk padding,
corruption detection, guards).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_stream_service_spark.operators.audiocodec import (
    decode_wav,
    encode_wav,
    synth_samples,
)


@pytest.mark.parametrize("channels", [1, 2, 4])
@pytest.mark.parametrize("rate", [8000, 44100])
def test_roundtrip(channels, rate):
    rng = np.random.default_rng(channels * rate)
    s = rng.integers(-32768, 32768, (321, channels), dtype=np.int16)
    dec, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert dec.shape == s.shape
    assert (dec == s).all()


def test_mono_1d_input_and_junk_chunk_padding():
    s = np.arange(-100, 100, dtype=np.int16)
    # odd-sized JUNK chunk: the decoder must apply the RIFF pad rule or
    # every subsequent chunk misparses
    data = encode_wav(s, 16000, junk_chunk=b"xyz")
    assert b"JUNK" in data
    dec, r = decode_wav(data)
    assert (dec[:, 0] == s).all() and dec.shape == (200, 1)
    # even-sized junk too
    dec2, _ = decode_wav(encode_wav(s, 16000, junk_chunk=b"abcd"))
    assert (dec2[:, 0] == s).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 500),
    channels=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(n, channels, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, channels), dtype=np.int16)
    dec, _ = decode_wav(encode_wav(s, 8000))
    assert (dec == s).all()


def test_corruption_detected():
    s = np.zeros(64, dtype=np.int16)
    good = encode_wav(s, 8000)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="size"):
        decode_wav(good[:-2])  # truncation breaks the declared RIFF size
    # declared size intact but chunk body cut: rebuild with a lying header
    bad = bytearray(good)
    (riff,) = struct.unpack("<I", bad[4:8])
    struct.pack_into("<I", bad, 4, riff - 4)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad[:-4]))


def test_unsupported_flavors_guarded():
    s = np.zeros((16, 1), dtype=np.int16)
    data = bytearray(encode_wav(s, 8000))
    fmt_at = data.find(b"fmt ")
    struct.pack_into("<H", data, fmt_at + 8, 3)  # format tag 3 = IEEE float
    # fix fmt consistency not needed: format tag checked first
    with pytest.raises(NotImplementedError, match="format=3"):
        decode_wav(bytes(data))
    with pytest.raises(NotImplementedError):
        encode_wav(np.zeros((2, 2, 2), dtype=np.int16), 8000)


def test_inconsistent_fmt_rejected():
    s = np.zeros((16, 2), dtype=np.int16)
    data = bytearray(encode_wav(s, 8000))
    fmt_at = data.find(b"fmt ")
    struct.pack_into("<H", data, fmt_at + 8 + 12, 6)  # block_align != c*2
    with pytest.raises(ValueError, match="inconsistent"):
        decode_wav(bytes(data))


def test_synth_samples_matches_sql_definition():
    payload = b"abcdefghij"
    for doc_id in (0, 13, 26, 105):
        s, rate = synth_samples(payload, doc_id)
        nf, c = 400 + 40 * (doc_id % 11), 1 + doc_id % 2
        assert s.shape == (nf, c)
        assert rate == 8000 * (1 + doc_id % 3)
        flat = s.reshape(-1)
        for j in (0, 1, flat.size - 1):
            assert flat[j] == (payload[j % len(payload)] - 128) * 256
    with pytest.raises(ValueError, match="empty"):
        synth_samples(b"", 1)

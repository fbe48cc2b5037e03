"""Pure-stdlib WAV (RIFF PCM16) codec.

The audio sibling of ``imagecodec.py`` (round 5): a real RIFF/WAVE
container encoder + decoder — chunk walk with declared-size validation,
unknown-chunk skipping with the RIFF odd-size padding rule, ``fmt ``
parsing, interleaved PCM16 frame extraction — using only ``struct`` plus
numpy for sample math. No audio library exists in this container and none
is needed: PCM in a RIFF container is bytes and arithmetic.

Scope (a training-data pipeline's audio lane): PCM (format tag 1),
16-bit, any channel count / sample rate. Compressed formats, other bit
depths, and WAVE_FORMAT_EXTENSIBLE raise ``NotImplementedError`` — real
guards, not padding.

Reference parity note: the reference treats payloads as opaque bytes
(MessageDeserializer.java:68) and has no media ops; this module is part
of the mandated north-star LLM-data surface (SURVEY.md §2.2 multimodal
rows). Like the image codec, it runs inside Arrow-batched ``mapInPandas``
stages — embarrassingly parallel across executors, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int, *, junk_chunk: bytes | None = None
) -> bytes:
    """Encode an (n_frames,) or (n_frames, channels) int16 array as a
    PCM16 WAV file. ``junk_chunk`` optionally inserts an unknown chunk
    between ``fmt `` and ``data`` (odd sizes get the RIFF pad byte) so
    decoders must implement real chunk skipping."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise NotImplementedError(f"unsupported sample shape {samples.shape}")
    n_frames, channels = s.shape
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    data = s.astype("<i2").tobytes()  # interleaved little-endian PCM16
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_chunk is not None:
        pad = b"\x00" if len(junk_chunk) % 2 else b""
        chunks += b"JUNK" + struct.pack("<I", len(junk_chunk)) + junk_chunk + pad
    chunks += b"data" + struct.pack("<I", len(data)) + data
    riff_body = b"WAVE" + chunks
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV file to ((n_frames, channels) int16, sample_rate).

    Real decode path: RIFF header + declared-size validation, chunk walk
    skipping unknown chunks (with odd-size padding), ``fmt `` parse with
    format/bit-depth/consistency checks, and interleaved frame reshape.
    Raises ``ValueError`` on corrupt containers and
    ``NotImplementedError`` on out-of-scope WAV flavors.
    """
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 != len(data):
        raise ValueError(f"RIFF size {riff_size} != file size {len(data)} - 8")
    if data[8:12] != b"WAVE":
        raise ValueError("RIFF form is not WAVE")
    pos = 12
    fmt = None
    pcm = None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk body")
        pos += 8 + size + (size % 2)  # RIFF pads odd chunks to even offsets
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        # any other chunk (JUNK, LIST, ...) is skipped
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    format_tag, channels, sample_rate, byte_rate, block_align, bits = fmt
    if format_tag != 1 or bits != 16:
        raise NotImplementedError(f"unsupported WAV: format={format_tag} bits={bits}")
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if block_align != channels * 2 or byte_rate != sample_rate * block_align:
        raise ValueError("inconsistent fmt fields")
    if len(pcm) % block_align:
        raise ValueError("data chunk is not a whole number of frames")
    samples = np.frombuffer(pcm, dtype="<i2").reshape(-1, channels)
    return samples, sample_rate


def synth_samples(payload: bytes, doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic PCM synthesis from a byte payload: interleaved int16
    samples cycled from the payload, dimensions pure integer functions of
    doc_id — so a SQL oracle can recompute every decoded sample without
    any WAV code (the audio analog of ``imagecodec.synth_pixels``).

    n_frames = 400 + 40 * (doc_id % 11), channels = 1 + doc_id % 2,
    sample_rate = 8000 * (1 + doc_id % 3),
    sample[j] = (payload[j % len] - 128) * 256  (j interleaved).
    """
    if not payload:
        raise ValueError("empty payload")
    n_frames = 400 + 40 * (doc_id % 11)
    channels = 1 + doc_id % 2
    rate = 8000 * (1 + doc_id % 3)
    n = n_frames * channels
    buf = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
    reps = -(-n // len(buf))
    flat = ((np.tile(buf, reps)[:n] - 128) * 256).astype(np.int16)
    return flat.reshape(n_frames, channels), rate

"""Pure-stdlib PNG codec + integer box-filter resize.

This replaces the round-1..4 multimodal *stubs*: the decode step here is a
real PNG decoder — chunk walk with CRC verification, IHDR parse, multi-IDAT
concatenation, zlib inflate, and full scanline *unfiltering* for all five
PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6) — and the resize
is a true box filter (integer mean over complete k×k blocks). Only the
Python standard library (``struct``, ``zlib``) plus numpy for pixel math is
used; no media libraries exist in this container and none are needed.

Scope (a training-data pipeline's image lane, not a general viewer):
8-bit depth, color types 0 (grayscale) and 2 (RGB), no interlace. Other
PNG shapes raise ``NotImplementedError`` — a real guard, not padding.

Reference parity note: the reference treats payloads as opaque bytes
(MessageDeserializer.java:68) and has no media ops; this module is part of
the mandated north-star LLM-data surface (SURVEY.md §2.2 multimodal rows).

Scale: these functions run inside Arrow-batched ``mapInPandas`` stages —
per-partition sequential streaming, zero driver involvement, and the
(small) per-image Python cost is embarrassingly parallel across executors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG filter-type codes (RFC 2083 §6.2).
FILT_NONE, FILT_SUB, FILT_UP, FILT_AVG, FILT_PAETH = 0, 1, 2, 3, 4


def _chunk(tag: bytes, body: bytes) -> bytes:
    """One PNG chunk: length, tag, body, CRC32(tag+body)."""
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to a+b-c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    pixels: np.ndarray, *, filter_for_row=None, idat_chunk_size: int = 1 << 14
) -> bytes:
    """Encode an (H, W) or (H, W, 3) uint8 array as a PNG.

    ``filter_for_row(y) -> 0..4`` selects the scanline filter (default:
    cycle through all five so every decoder path is exercised);
    ``idat_chunk_size`` splits the compressed stream into multiple IDAT
    chunks (decoders must concatenate — also exercised on purpose).
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        channels, color_type = 1, 0
        flat = px
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, _ = px.shape
        channels, color_type = 3, 2
        flat = px.reshape(h, w * 3)
    else:
        raise NotImplementedError(f"unsupported pixel shape {px.shape} (gray/RGB 8-bit only)")
    if filter_for_row is None:
        filter_for_row = lambda y: y % 5  # noqa: E731 — default cycles all filters
    bpp = channels
    stride = w * channels
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y].astype(np.int32)
        ft = filter_for_row(y)
        if ft == FILT_NONE:
            out = cur
        elif ft == FILT_SUB:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            out = (cur - left) & 0xFF
        elif ft == FILT_UP:
            out = (cur - prev) & 0xFF
        elif ft == FILT_AVG:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            out = (cur - (left + prev) // 2) & 0xFF
        elif ft == FILT_PAETH:
            out = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                out[x] = (int(cur[x]) - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        raw.append(ft)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    compressed = zlib.compress(bytes(raw), 6)
    idats = b"".join(
        _chunk(b"IDAT", compressed[i : i + idat_chunk_size])
        for i in range(0, max(len(compressed), 1), idat_chunk_size)
    )
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + idats + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG (8-bit gray or RGB, non-interlaced) to a uint8 array
    of shape (H, W) or (H, W, 3).

    Real decode path: signature check, chunk walk with CRC32 verification,
    IHDR parse, multi-IDAT concat, zlib inflate, then per-scanline
    unfiltering of all five filter types. Raises ``ValueError`` on corrupt
    streams and ``NotImplementedError`` on out-of-scope PNG shapes.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            seen_iend = True
            break
        # ancillary chunks: skipped (CRC still verified above)
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG: depth={depth} color_type={color_type} interlace={interlace}"
        )
    channels = 1 if color_type == 0 else 3
    bpp = channels
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(f"bad raw length {len(raw)} for {w}x{h}x{channels}")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == FILT_NONE:
            cur = line
        elif ft == FILT_UP:
            cur = (line + prev) & 0xFF
        elif ft == FILT_SUB:
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == FILT_AVG:
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + (left + int(prev[x])) // 2) & 0xFF
        elif ft == FILT_PAETH:
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft} on scanline {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)


def box_resize(pixels: np.ndarray, k: int) -> np.ndarray:
    """True box-filter downsample by integer factor ``k``: each output
    pixel is the floor-mean of a complete k×k input block (edge rows/cols
    that don't fill a block are cropped — this keeps the math exact and
    the oracle SQL-expressible). Works on (H, W) and (H, W, C) uint8."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w, c = px.shape
    oh, ow = h // k, w // k
    if oh == 0 or ow == 0:
        raise ValueError(f"image {w}x{h} too small for factor {k}")
    block = px[: oh * k, : ow * k, :].astype(np.int64)
    out = block.reshape(oh, k, ow, k, c).sum(axis=(1, 3)) // (k * k)
    out = out.astype(np.uint8)
    return out[:, :, 0] if gray else out


def synth_pixels(payload: bytes, doc_id: int) -> np.ndarray:
    """Deterministic image synthesis from a byte payload: row-major,
    channel-interleaved pixel bytes cycled from the payload. Both the
    dimensions and every pixel value are pure integer functions of
    (doc_id, payload), so a SQL oracle can recompute the decoded pixels
    without any PNG code — which is exactly what makes the *decoder*
    hash-checkable end-to-end.

    W = 16 + doc_id % 17, H = 12 + doc_id % 13,
    C = 1 if doc_id even else 3, pixel[j] = payload[j % len(payload)].
    """
    if not payload:
        raise ValueError("empty payload")
    w = 16 + doc_id % 17
    h = 12 + doc_id % 13
    c = 1 if doc_id % 2 == 0 else 3
    n = w * h * c
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-n // len(buf))
    flat = np.tile(buf, reps)[:n]
    return flat.reshape(h, w) if c == 1 else flat.reshape(h, w, 3)

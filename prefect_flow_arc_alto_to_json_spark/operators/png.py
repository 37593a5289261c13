"""Pure-numpy/zlib PNG codec — a REAL image decode kernel for the
multimodal path (no PIL/ffmpeg in this container; PNG needs only stdlib
``zlib``/``struct``/``binascii``, all present).

Scope: 8-bit RGB (color type 2), non-interlaced — the encoder below always
produces that profile, and the decoder additionally understands all five
scanline filters (None/Sub/Up/Average/Paeth) so it reads any conforming
baseline RGB8 PNG, not just its own output. Used by
``operators.multimodal`` as the image-modality decode kernel; audio/video
stay behind deterministic stubs (codecs genuinely absent here).

Everything is deterministic: encode(decode(x)) and decode(encode(x)) are
exact (PNG is lossless), which the property tests assert.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a baseline RGB8 PNG (filter 0,
    one IDAT, fixed zlib level → byte-deterministic)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters; ``raw`` is h rows of (1 filter byte +
    stride data bytes)."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype} on row {y}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a baseline non-interlaced RGB8 PNG into (h, w, 3) uint8.

    Full structural validation: signature, chunk CRCs, IHDR profile,
    IDAT zlib stream and expected decompressed length — corrupt inputs
    raise ValueError (the multimodal operator maps that to an error row,
    never a task failure)."""
    if data[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIGNATURE)
    ihdr: tuple[int, int] | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG profile (need 8-bit RGB non-interlaced)"
                )
            ihdr = (h, w)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    h, w = ihdr
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * 3
    if raw.size != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


def bytes_to_pixels(payload: bytes, side: int = 16) -> np.ndarray:
    """Deterministic bytes → (side, side, 3) uint8 image (tile/truncate the
    byte stream) — how the synthetic corpus turns document text into real
    image payloads."""
    need = side * side * 3
    buf = (payload * (need // max(len(payload), 1) + 1))[:need]
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(side, side, 3)


def png_features(data: bytes, dim: int = 16) -> np.ndarray:
    """Decode + summarize: [w, h, mean/std per RGB channel, 8-bin luma
    histogram density] — a real decode-derived feature vector, ``dim``
    floats."""
    px = decode_png(data).astype(np.float64)
    h, w, _ = px.shape
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
    feats = np.concatenate(
        [
            [float(w), float(h)],
            px.reshape(-1, 3).mean(axis=0),
            px.reshape(-1, 3).std(axis=0),
            hist / luma.size,
        ]
    )
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, feats.size)] = feats[:dim].astype(np.float32)
    return out


from ..functions.selfship import self_ship  # noqa: E402

# Referenced from multimodal mapInPandas kernels — ship by value so
# executors never need this package importable (see functions/selfship.py).
self_ship(__name__)

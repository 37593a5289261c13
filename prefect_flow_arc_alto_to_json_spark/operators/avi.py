"""Pure-numpy/stdlib AVI (RIFF video) codec — a REAL video decode kernel
for the multimodal path, completing the codec family started by
``operators/png.py`` (image) and ``operators/wav.py`` (audio). No ffmpeg
exists in this container, but uncompressed 24-bit RGB AVI ("DIB " / BI_RGB)
is a genuine, fully-specified container+pixel format that needs only
``struct`` + numpy — the same argument that made canonical WAV parseable.

Scope: single 'vids' stream, 24-bit uncompressed bottom-up DIB frames
('00db' chunks). The encoder always produces that profile; the decoder
reads any conforming file: it walks RIFF chunks and recurses into LIST
forms (so files carrying extra LIST/INFO/JUNK or an idx1 index still
parse, exactly like a real parser must), validates header consistency
(avih vs strh vs BITMAPINFOHEADER vs actual chunk sizes), and rebuilds
RGB frames from the DIB convention — bottom-up row order, BGR byte order,
rows padded to 4-byte boundaries. The synth side is 10 px wide so each
row is 30 bytes and the 2-byte row padding path is actually exercised.

Everything is deterministic: decode(encode(x)) is exact (the pixels are
uncompressed), which the tests assert frame-for-frame, and the SQL
oracles recompute decode-derived statistics from raw payload bytes.
"""

from __future__ import annotations

import struct

import numpy as np

#: synth/encode defaults — fixed so features are reproducible in SQL oracles
SYNTH_FRAMES = 4
SYNTH_SIDE = 10
FPS = 10


def _chunk(tag: bytes, payload: bytes) -> bytes:
    """RIFF chunk: tag + size + payload, padded to an even byte boundary."""
    return tag + struct.pack("<I", len(payload)) + payload + (b"\x00" * (len(payload) & 1))


def _list(form: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", form + payload)


def encode_avi(frames: np.ndarray, fps: int = FPS) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a canonical uncompressed AVI:
    RIFF 'AVI ' → LIST hdrl (avih + LIST strl (strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER)) → LIST movi ('00db' DIB frames). Frames are stored
    in the DIB convention: bottom-up rows, BGR channel order, rows padded
    to 4-byte multiples."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError(f"expected (n,h,w,3) uint8, got {frames.shape} {frames.dtype}")
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def dib(frame: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
        return rows.tobytes()

    avih = struct.pack(
        "<10I",
        1_000_000 // fps,   # dwMicroSecPerFrame
        frame_size * fps,   # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        0,                  # dwFlags
        n,                  # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        frame_size,         # dwSuggestedBufferSize
        w,
        h,
    ) + b"\x00" * 16        # dwReserved[4]
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids",
        b"DIB ",
        0, 0, 0, 0,         # flags, priority, language, initial frames
        1,                  # dwScale
        fps,                # dwRate (fps = rate/scale)
        0,                  # dwStart
        n,                  # dwLength (frames)
        frame_size,         # dwSuggestedBufferSize
        0,                  # dwQuality
        0,                  # dwSampleSize
        0, 0, w, h,         # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h,           # biSize, biWidth, biHeight (+h → bottom-up)
        1, 24,              # biPlanes, biBitCount
        0,                  # biCompression = BI_RGB
        frame_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, form_or_None, payload_start, payload_len) over a RIFF
    chunk run; LIST chunks report their form and their *inner* payload."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + length > end:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"LIST":
            if length < 4:
                raise ValueError("LIST chunk too short for a form tag")
            yield tag, data[pos + 8 : pos + 12], pos + 12, length - 4
        else:
            yield tag, None, pos + 8, length
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed 24-bit AVI → ((n, h, w, 3) uint8 RGB, fps).

    Full structural validation: RIFF/'AVI ' magic and declared size, LIST
    recursion (unknown chunks/lists like JUNK, INFO, idx1 are skipped),
    avih/strh/strf mutual consistency (vids stream, BI_RGB 24-bit,
    matching dimensions and frame counts), per-frame chunk size = padded
    stride × height — corrupt inputs raise ValueError (the multimodal
    operator maps that to an error row, never a task failure)."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not an AVI: bad RIFF magic")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    if data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad form magic")

    avih = strh = strf = None
    frames_raw: list[bytes] = []
    for tag, form, p, ln in _walk(data, 12, 8 + riff_size):
        if tag == b"LIST" and form == b"hdrl":
            for t2, f2, p2, l2 in _walk(data, p, p + ln):
                if t2 == b"avih":
                    if l2 < 40:
                        raise ValueError("avih chunk too short")
                    avih = struct.unpack_from("<10I", data, p2)
                elif t2 == b"LIST" and f2 == b"strl":
                    for t3, _f3, p3, l3 in _walk(data, p2, p2 + l2):
                        if t3 == b"strh":
                            if l3 < 48:
                                raise ValueError("strh chunk too short")
                            strh = struct.unpack_from("<4s4sIHHIIIIIIIi", data, p3)
                        elif t3 == b"strf":
                            if l3 < 40:
                                raise ValueError("strf chunk too short")
                            strf = struct.unpack_from("<IiiHHIIiiII", data, p3)
        elif tag == b"LIST" and form == b"movi":
            for t2, _f2, p2, l2 in _walk(data, p, p + ln):
                if t2 in (b"00db", b"00dc"):
                    frames_raw.append(data[p2 : p2 + l2])

    if avih is None or strh is None or strf is None:
        raise ValueError("missing avih/strh/strf header")
    if strh[0] != b"vids":
        raise ValueError("first stream is not video")
    _, w, h, planes, bits, compression = strf[0], strf[1], strf[2], strf[3], strf[4], strf[5]
    if bits != 24 or compression != 0 or planes != 1:
        raise ValueError("unsupported AVI profile (need uncompressed 24-bit BI_RGB)")
    if h <= 0 or w <= 0:
        raise ValueError("top-down or degenerate DIB not supported")
    if (avih[8], avih[9]) != (w, h):
        raise ValueError("avih/strf dimension mismatch")
    scale, rate, n_frames = strh[6], strh[7], strh[9]
    if scale == 0 or rate % scale:
        raise ValueError("non-integer frame rate")
    if len(frames_raw) != n_frames or n_frames != avih[4]:
        raise ValueError(
            f"frame count mismatch: movi={len(frames_raw)} strh={n_frames} avih={avih[4]}"
        )
    if n_frames == 0:
        raise ValueError("no video frames")
    stride = (w * 3 + 3) & ~3
    out = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) != stride * h:
            raise ValueError(f"frame {i}: size {len(raw)} != {stride * h}")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # un-flip + RGB
    return out, rate // scale


def bytes_to_frames(
    payload: bytes, n: int = SYNTH_FRAMES, side: int = SYNTH_SIDE
) -> np.ndarray:
    """Deterministic bytes → (n, side, side, 3) uint8 RGB frames
    (tile/truncate the byte stream) — how the synthetic corpus turns
    document text into real video payloads (companion of
    ``png.bytes_to_pixels`` / ``wav.bytes_to_samples``). Byte at linear
    offset j of the tiled buffer is ``payload[j % len]``, which is what
    the SQL oracles recompute."""
    need = n * side * side * 3
    buf = (payload * (need // max(len(payload), 1) + 1))[:need]
    if len(buf) < need:
        raise ValueError("empty payload cannot synthesize frames")
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(n, side, side, 3)


def avi_features(data: bytes, dim: int = 16) -> np.ndarray:
    """Decode + summarize: [fps, n_frames, mean per RGB channel, motion
    (mean abs inter-frame difference), height, width, 8-bin luma histogram
    density] → ``dim`` float32s — a real decode-derived video feature
    vector (companion of ``png.png_features`` / ``wav.wav_features``;
    feature index 2, the R-channel mean over all frames, is the one the
    SQL oracle recomputes from raw bytes)."""
    frames, fps = decode_avi(data)
    px = frames.astype(np.float64)
    n, h, w, _ = px.shape
    chan_mean = px.reshape(-1, 3).mean(axis=0)
    motion = float(np.abs(px[1:] - px[:-1]).mean()) if n > 1 else 0.0
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
    feats = np.concatenate(
        [[float(fps), float(n)], chan_mean, [motion, float(h), float(w)], hist / luma.size]
    )
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, feats.size)] = feats[:dim].astype(np.float32)
    return out


from ..functions.selfship import self_ship  # noqa: E402

# Referenced from multimodal mapInPandas kernels — ship by value so
# executors never need this package importable (see functions/selfship.py).
self_ship(__name__)

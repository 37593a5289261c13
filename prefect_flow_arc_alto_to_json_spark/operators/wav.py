"""Pure-numpy/stdlib WAV (RIFF/PCM) codec — a REAL audio decode kernel for
the multimodal path, companion to ``operators/png.py`` (no ffmpeg/soundfile
in this container; canonical WAV needs only ``struct`` + numpy).

Scope: 16-bit PCM, mono or stereo, any sample rate — the encoder below
always produces 16-bit mono, and the decoder reads any conforming
16-bit PCM RIFF file (it walks chunks, so extra chunks like LIST/INFO are
skipped, exactly like a real parser must). Used by ``operators.multimodal``
as the audio-modality decode kernel; video remains the one stubbed
modality (genuinely no codec available here).

Everything is deterministic: decode(encode(x)) is exact (PCM is lossless),
which the tests assert sample-for-sample.
"""

from __future__ import annotations

import struct

import numpy as np

#: synth/encode defaults — fixed so features are reproducible in SQL oracles
SAMPLE_RATE = 8000
SYNTH_SAMPLES = 2048


def encode_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """Encode a 1-D int16 array as a canonical 16-bit mono PCM WAV file
    (RIFF → fmt → data, little-endian, no padding tricks)."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError(f"expected 1-D int16, got {samples.shape} {samples.dtype}")
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,                 # PCM
        1,                 # mono
        sample_rate,
        sample_rate * 2,   # byte rate
        2,                 # block align
        16,                # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM RIFF/WAV file → (samples int16 (n, channels),
    sample_rate).

    Full structural validation: RIFF/WAVE magic, declared RIFF size, chunk
    walk (unknown chunks skipped, word-aligned), fmt sanity (PCM, 16-bit,
    consistent block align), data length a multiple of the frame size —
    corrupt inputs raise ValueError (the multimodal operator maps that to
    an error row, never a task failure)."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a WAV: bad RIFF magic")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    if data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad WAVE magic")
    pos = 12
    fmt: tuple[int, int, int] | None = None  # (channels, rate, block_align)
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _brate, balign, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV profile (need 16-bit PCM)")
            if channels not in (1, 2) or balign != channels * 2:
                raise ValueError("bad channel/block-align combination")
            fmt = (channels, rate, balign)
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate, balign = fmt
    if len(pcm) % balign:
        raise ValueError("data length not a multiple of the frame size")
    samples = np.frombuffer(pcm, dtype="<i2").reshape(-1, channels)
    return samples, rate


def bytes_to_samples(payload: bytes, n: int = SYNTH_SAMPLES) -> np.ndarray:
    """Deterministic bytes → n int16 samples (tile/truncate the byte stream,
    consume little-endian byte pairs) — how the synthetic corpus turns
    document text into real audio payloads (companion of
    ``png.bytes_to_pixels``)."""
    need = n * 2
    buf = (payload * (need // max(len(payload), 1) + 1))[:need]
    if len(buf) < need:
        raise ValueError("empty payload cannot synthesize samples")
    return np.frombuffer(bytes(buf), dtype="<i2")


def wav_features(data: bytes, dim: int = 16) -> np.ndarray:
    """Decode + summarize: [sample_rate, n_frames, mean, std, RMS,
    zero-crossing rate, 8-bin amplitude histogram density] → ``dim``
    float32s — a real decode-derived audio feature vector (companion of
    ``png.png_features``; feature index 2, the sample mean, is the one the
    SQL oracle recomputes from raw bytes)."""
    samples, rate = decode_wav(data)
    mono = samples.astype(np.float64).mean(axis=1)
    n = mono.size
    if n == 0:
        raise ValueError("no audio frames")
    mean = mono.mean()
    std = mono.std()
    rms = np.sqrt((mono**2).mean())
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / n
    hist, _ = np.histogram(mono, bins=8, range=(-32768.0, 32768.0))
    feats = np.concatenate(
        [[float(rate), float(n), mean, std, rms, zcr], hist / n]
    )
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, feats.size)] = feats[:dim].astype(np.float32)
    return out


from ..functions.selfship import self_ship  # noqa: E402

# Referenced from multimodal mapInPandas kernels — ship by value so
# executors never need this package importable (see functions/selfship.py).
self_ship(__name__)

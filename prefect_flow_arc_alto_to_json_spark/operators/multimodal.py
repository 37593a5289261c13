"""Multimodal column operators: image/audio/video as opaque ``binary``
payloads + typed metadata structs (schemas.MULTIMODAL_ASSET_SCHEMA), with
Arrow-batched pandas UDF plumbing for decode / feature-extract / resize /
frame-sample.

ALL THREE modalities are decoded for real: payloads are actual PNG
files (``pngify_images`` → full parse with chunk CRCs, zlib inflate,
scanline unfilter via ``operators/png.py``), actual RIFF/PCM WAV files
(``wavify_audio`` → chunk-walking parser in ``operators/wav.py``), and
actual uncompressed-DIB AVI files (``avify_videos`` → RIFF LIST
recursion, header cross-validation, bottom-up BGR row-padded frame
rebuild in ``operators/avi.py``). ``default_fake_decoder`` remains only
as the plumbing-test stand-in for arbitrary non-container payloads;
``media_decoder`` routes every modality through its real codec.
Swapping in ffmpeg/PIL later changes one function, not the plan.

Scale notes: payloads ride the columnar path as Arrow binary buffers; the
``mapInPandas`` boundary streams batches (maxRecordsPerBatch controls peak
memory — at 4K-image scale, lower it). Feature extraction is narrow; only
the optional dedup-by-phash step shuffles, and only on a 64-bit key.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scale import fan_out
from . import avi as avi_mod
from . import wav as wav_mod
from .avi import avi_features, bytes_to_frames, decode_avi, encode_avi
from .png import bytes_to_pixels, decode_png, encode_png, png_features
from .wav import bytes_to_samples, decode_wav, encode_wav, wav_features

FEATURE_DIM = 16

#: decoder(payload bytes, modality str) -> np.ndarray[float32] feature vec.
#: Default: deterministic fake (md5-seeded) standing in for a real
#: image/audio model; replace via set_decoder.
_decoder: Callable[[bytes, str], np.ndarray] | None = None


def default_fake_decoder(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in 'decode + embed': hash-seeded pseudo-features.

    NOT a real decoder — it exists so the distributed plumbing (schema,
    batching, ordering, null handling) is testable in this container.
    """
    if payload is None:
        raise ValueError("null payload")
    digest = hashlib.md5(modality.encode() + b":" + payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def set_decoder(fn: Callable[[bytes, str], np.ndarray] | None) -> None:
    """Install a real decode/feature kernel (e.g. PIL + CLIP). ``None``
    restores the deterministic fake."""
    global _decoder
    _decoder = fn


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    modality_col: str = "modality",
    id_col: str = "asset_id",
    decoder: Callable[[bytes, str], np.ndarray] | None = None,
) -> DataFrame:
    """(asset_id, feature array<float>, feature_dim, decode_error) via
    Arrow-batched mapInPandas; a corrupt payload yields an error row, never
    a task failure (same isolation policy as sources/fetch.py).

    ``decoder`` overrides per-call; otherwise the ``set_decoder`` global,
    else the deterministic fake."""
    out_schema = (
        f"{id_col} long, feature array<float>, feature_dim int, decode_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decoder or _decoder or default_fake_decoder
        for pdf in batches:
            ids, feats, dims, errs = [], [], [], []
            for aid, payload, modality in zip(
                pdf[id_col], pdf[payload_col], pdf[modality_col]
            ):
                ids.append(aid)
                try:
                    vec = decode(bytes(payload) if payload is not None else None, modality)
                    feats.append([float(x) for x in vec])
                    dims.append(len(vec))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001
                    feats.append(None)
                    dims.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "feature": feats,
                    "feature_dim": dims,
                    "decode_error": errs,
                }
            )

    return fan_out(df.select(id_col, payload_col, modality_col)).mapInPandas(
        run, schema=out_schema
    )


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-JVM metadata pass: size, md5 — binary columns work with
    built-ins, no decode needed (this is the cheap 100 TB-scale triage
    query: corrupt/empty/duplicate payloads fall out of this alone)."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def dedup_by_payload(df: DataFrame, id_col: str = "asset_id", payload_col: str = "payload") -> DataFrame:
    """Exact binary dedup: group on md5(payload), keep min id. The only
    shuffle key is the 128-bit digest string."""
    return (
        df.select(F.md5(F.col(payload_col)).alias("payload_md5"), F.col(id_col))
        .groupBy("payload_md5")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _reencode_modality(
    df: DataFrame,
    modality: str,
    encode_one: Callable[[bytes], bytes],
    payload_col: str = "payload",
    modality_col: str = "modality",
) -> DataFrame:
    """Shared narrow re-encode pass: rows of ``modality`` get their payload
    replaced by ``encode_one(payload)``; everything else passes through.
    Per-row isolation: an un-encodable payload (e.g. b'' from an empty
    text) passes through unchanged instead of failing the whole task."""
    cols = df.columns

    def one(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        try:
            return encode_one(bytes(p))
        except Exception:  # noqa: BLE001
            return bytes(p)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            hit = pdf[modality_col] == modality
            pdf.loc[hit, payload_col] = [
                one(p) for p in pdf.loc[hit, payload_col]
            ]
            yield pdf

    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols
    )
    return df.mapInPandas(run, schema=schema)


def pngify_images(
    df: DataFrame,
    payload_col: str = "payload",
    modality_col: str = "modality",
    side: int = 16,
) -> DataFrame:
    """Re-encode image-modality payloads as REAL PNG files (bytes →
    deterministic pixel tile → baseline RGB8 PNG), leaving other modalities
    untouched — the synthetic corpus' image column becomes an actual image
    format that the real decoder below must parse."""
    return _reencode_modality(
        df,
        "image",
        lambda p: encode_png(bytes_to_pixels(p, side)),
        payload_col,
        modality_col,
    )


def wavify_audio(
    df: DataFrame,
    payload_col: str = "payload",
    modality_col: str = "modality",
    n_samples: int = wav_mod.SYNTH_SAMPLES,
) -> DataFrame:
    """Re-encode audio-modality payloads as REAL WAV files (bytes →
    deterministic int16 samples → 16-bit mono PCM RIFF), the audio twin of
    :func:`pngify_images` — the synthetic corpus' audio column becomes an
    actual audio container the real decoder below must parse."""
    return _reencode_modality(
        df,
        "audio",
        lambda p: encode_wav(bytes_to_samples(p, n_samples)),
        payload_col,
        modality_col,
    )


def reencode_media(
    df: DataFrame,
    payload_col: str = "payload",
    modality_col: str = "modality",
    png_side: int = 16,
    wav_samples: int = wav_mod.SYNTH_SAMPLES,
    avi_frames: int = avi_mod.SYNTH_FRAMES,
    avi_side: int = avi_mod.SYNTH_SIDE,
) -> DataFrame:
    """All three modality re-encodes (PNG/WAV/AVI) in ONE Arrow pass.

    Chaining pngify→wavify→avify costs three ``mapInPandas`` stages, each
    round-tripping every row's full payload through Arrow + the Python
    worker even though each stage touches only a third of the rows. One
    fused pass keeps the per-row switch in Python (where it is a dict
    lookup) and cuts the Python-boundary crossings of the whole
    mm_features plan from 4 to 2 — at 100 TB the payload column IS the
    dataset, so every avoided serialization pass is a full-corpus IO
    saving."""
    encoders: dict[str, Callable[[bytes], bytes]] = {
        "image": lambda p: encode_png(bytes_to_pixels(p, png_side)),
        "audio": lambda p: encode_wav(bytes_to_samples(p, wav_samples)),
        "video": lambda p: encode_avi(bytes_to_frames(p, avi_frames, avi_side)),
    }
    cols = df.columns

    def one(p: bytes | None, enc: Callable[[bytes], bytes] | None) -> bytes | None:
        if p is None or enc is None:
            return p
        try:
            return enc(bytes(p))
        except Exception:  # noqa: BLE001
            return bytes(p)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                one(p, encoders.get(m))
                for p, m in zip(pdf[payload_col], pdf[modality_col])
            ]
            yield pdf

    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols
    )
    return df.mapInPandas(run, schema=schema)


def avify_videos(
    df: DataFrame,
    payload_col: str = "payload",
    modality_col: str = "modality",
    n_frames: int = avi_mod.SYNTH_FRAMES,
    side: int = avi_mod.SYNTH_SIDE,
) -> DataFrame:
    """Re-encode video-modality payloads as REAL AVI files (bytes →
    deterministic RGB frame stack → uncompressed 24-bit DIB RIFF), the
    video sibling of :func:`pngify_images` / :func:`wavify_audio` — the
    synthetic corpus' video column becomes an actual video container the
    real decoder below must parse."""
    return _reencode_modality(
        df,
        "video",
        lambda p: encode_avi(bytes_to_frames(p, n_frames, side)),
        payload_col,
        modality_col,
    )


def png_image_decoder(payload: bytes, modality: str) -> np.ndarray:
    """REAL decode for the image modality: full PNG parse (signature,
    chunk CRCs, zlib inflate, scanline unfilter) + pixel-statistics
    features via operators/png.py. Audio/video still route to the
    deterministic stub (see :func:`media_decoder` for the audio upgrade).

    NOTE: ``png_features`` must be imported at MODULE level (not inside
    this body): this function executes on executors, where the package is
    not importable — a runtime relative import dies with
    ModuleNotFoundError there, while a module-global reference ships by
    value with the closure (functions/selfship.py). A body-level import
    here silently turned every image row into a decode-error row in the
    driver's own session (caught round 3 by the mm_features oracle)."""
    if modality == "image":
        return png_features(payload, FEATURE_DIM)
    return default_fake_decoder(payload, modality)


def media_decoder(payload: bytes, modality: str) -> np.ndarray:
    """REAL decode for ALL modalities: PNG parse → pixel statistics,
    RIFF/PCM parse → waveform statistics, RIFF/AVI parse → frame
    statistics (operators/png.py, operators/wav.py, operators/avi.py).
    Since round 3 completed the AVI codec, nothing here is a stub; an
    unknown modality string falls back to the deterministic fake so the
    plumbing still degrades to an answer rather than a task failure."""
    if modality == "image":
        return png_features(payload, FEATURE_DIM)
    if modality == "audio":
        return wav_features(payload, FEATURE_DIM)
    if modality == "video":
        return avi_features(payload, FEATURE_DIM)
    return default_fake_decoder(payload, modality)


def audio_frame_energy(
    df: DataFrame,
    frame_len: int = 256,
    payload_col: str = "payload",
    modality_col: str = "modality",
    id_col: str = "asset_id",
) -> DataFrame:
    """Per-frame RMS energy of audio payloads: REAL WAV decode →
    fixed-length frame windows → one RMS row per frame — the windowed-DSP
    shape of audio preprocessing (VAD gating, silence trimming, loudness
    normalization all start from exactly this relation).

    Scale: narrow Arrow-batched ``mapInPandas``; output is
    (n_frames/frame_len) rows per asset, so downstream aggregation works
    on energies, never raw samples. A corrupt payload yields an error row
    (isolation policy of this module)."""
    schema = f"{id_col} long, frame_idx int, rms double, frame_error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, rms, errs = [], [], [], []
            for aid, payload, modality in zip(
                pdf[id_col], pdf[payload_col], pdf[modality_col]
            ):
                if modality != "audio":
                    continue
                try:
                    # decode_wav by direct function reference: a closure that touches
                    # the wav MODULE object would pickle it by name and die with
                    # ModuleNotFoundError on executors (modules always pickle by
                    # reference, even under register_pickle_by_value)
                    samples, _rate = decode_wav(bytes(payload))
                    mono = samples.astype(np.float64).mean(axis=1)
                    n_frames = mono.size // frame_len
                    frames = mono[: n_frames * frame_len].reshape(
                        n_frames, frame_len
                    )
                    energy = np.sqrt((frames**2).mean(axis=1))
                    ids += [aid] * n_frames
                    fidx += list(range(n_frames))
                    rms += [float(x) for x in energy]
                    errs += [None] * n_frames
                except Exception as exc:  # noqa: BLE001
                    ids.append(aid)
                    fidx.append(-1)
                    rms.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "rms": rms, "frame_error": errs}
            )

    return fan_out(df.select(id_col, payload_col, modality_col)).mapInPandas(
        run, schema=schema
    )


def resize_images(
    df: DataFrame,
    target: int = 8,
    payload_col: str = "payload",
    modality_col: str = "modality",
    id_col: str = "asset_id",
) -> DataFrame:
    """REAL image resize: decode PNG → area-mean downsample to
    (target, target) → re-encode PNG, Arrow-batched. Non-image rows pass
    through untouched; a corrupt image yields an error row with the
    original payload (same isolation policy as extract_features).

    Scale: narrow mapInPandas — the classic preprocessing pass of an image
    training pipeline (decode→resize→re-encode), bytes in / bytes out with
    no shuffle; output payloads shrink, so downstream stages move less
    data.
    """
    cols = df.columns
    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols
    ) + ", resize_error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes | None, modality: str):
            if modality != "image" or payload is None:
                return payload, None
            try:
                px = decode_png(bytes(payload))
                h, w, _ = px.shape
                # area-mean pooling via crop-to-multiple + reshape (exact,
                # deterministic; no interpolation library needed)
                hh, ww = (h // target) * target, (w // target) * target
                if hh == 0 or ww == 0:
                    raise ValueError(f"image {h}x{w} smaller than target")
                small = (
                    px[:hh, :ww]
                    .reshape(target, hh // target, target, ww // target, 3)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                return encode_png(small), None
            except Exception as exc:  # noqa: BLE001
                return payload, f"{type(exc).__name__}: {exc}"

        for pdf in batches:
            pdf = pdf.copy()
            out = [one(p, m) for p, m in zip(pdf[payload_col], pdf[modality_col])]
            pdf[payload_col] = [o[0] for o in out]
            pdf["resize_error"] = [o[1] for o in out]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def frame_sample_plan(
    df: DataFrame,
    every_n_ms: int = 1000,
    id_col: str = "asset_id",
) -> DataFrame:
    """Video frame-sampling *plan*: explode each video into (asset_id,
    frame_ts_ms) rows from its duration metadata — the decode of each frame
    is then a per-row kernel like extract_features. Pure built-ins: the
    expensive part (decode) stays isolated behind the same UDF boundary."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_n_ms),
            )
        ).alias("frame_ts_ms"),
    )


def video_frame_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
) -> DataFrame:
    """Per-frame R-channel byte SUMS from a real AVI decode — the
    integer-exact statistic the scene-change query builds deltas over.
    Emits (asset_id, frame_idx, r_sum, decode_error); a corrupt payload
    yields ONE error row (frame_idx -1), never a task failure (the
    extract_features isolation policy).

    The Python boundary carries decode only: thresholds, lags and cut
    flags stay JVM-side in the calling plan. r_sum is an exact integer
    (sum of h*w uint8 values), so downstream math is float-free.

    Scale: Arrow-batched mapInPandas, one output row per frame — at k
    frames per asset the expansion is k·|assets| small integer rows, and
    the subsequent lag window shuffles once on asset_id.
    """
    out_schema = f"{id_col} long, frame_idx int, r_sum long, decode_error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums, errs = [], [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames, _fps = decode_avi(
                        bytes(payload) if payload is not None else None
                    )
                    for fi in range(frames.shape[0]):
                        ids.append(aid)
                        idxs.append(fi)
                        sums.append(int(frames[fi, :, :, 0].astype("int64").sum()))
                        errs.append(None)
                except Exception as exc:  # noqa: BLE001
                    ids.append(aid)
                    idxs.append(-1)
                    sums.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "r_sum": sums,
                    "decode_error": errs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def image_ahash_words(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
) -> DataFrame:
    """Perceptual average-hash of REAL PNG payloads, emitted as FOUR
    16-bit words — the image-space near-dup signature (companion of
    SimHash for text): decode (operators/png.py, CRC + unfilter), 2x2
    block-mean downsample of the 16x16 R channel to 8x8, bit b set iff
    block b's sum beats the global mean. The mean comparison is the
    integer cross-multiplication ``block_sum * 64 > total_sum`` — no
    division, so the 64 bits are an exact function of the pixels and the
    SQL oracle replays them bit-for-bit.

    Words instead of one 64-bit long because (a) bit 63 would overflow
    the signed long and (b) the 4x16-bit split IS the pigeonhole banding
    the near-dup join needs: hamming distance <= 3 guarantees at least
    one exactly-equal word. Corrupt payloads yield an error row (words
    null), never a task failure.
    """
    out_schema = (
        f"{id_col} long, w0 long, w1 long, w2 long, w3 long, decode_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = decode_png(bytes(payload) if payload is not None else None)
                    r = px[:, :, 0].astype("int64")
                    # 2x2 block sums of the 16x16 → 8x8 grid, row-major
                    blocks = r.reshape(8, 2, 8, 2).sum(axis=(1, 3)).reshape(64)
                    total = int(blocks.sum())
                    bits = [int(int(b) * 64 > total) for b in blocks]
                    words = [
                        sum(bits[w * 16 + i] << i for i in range(16))
                        for w in range(4)
                    ]
                    rows.append((aid, *words, None))
                except Exception as exc:  # noqa: BLE001
                    rows.append((aid, None, None, None, None, f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows, columns=[id_col, "w0", "w1", "w2", "w3", "decode_error"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def audio_frame_sumsq(
    df: DataFrame,
    frame_samples: int = 256,
    payload_col: str = "payload",
    id_col: str = "asset_id",
) -> DataFrame:
    """Per-frame audio ENERGY as the exact integer sum-of-squares from a
    real WAV decode — the INTEGER sibling of audio_frame_energy above
    (which emits float RMS): activity thresholds compare ss directly, so
    the whole gate stays integer-exact and SQL-replayable. Emits
    (asset_id, frame_idx, ss, decode_error); corrupt payloads yield one
    error row (frame_idx -1), never a task failure. No sqrt: callers
    threshold on ss directly, keeping the whole activity gate integer-
    exact (and SQL-replayable)."""
    out_schema = f"{id_col} long, frame_idx int, ss long, decode_error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, _sr = decode_wav(
                        bytes(payload) if payload is not None else None
                    )
                    arr = samples.astype("int64")
                    for fi in range(len(arr) // frame_samples):
                        seg = arr[fi * frame_samples : (fi + 1) * frame_samples]
                        rows.append((aid, fi, int((seg * seg).sum()), None))
                except Exception as exc:  # noqa: BLE001
                    rows.append(
                        (aid, -1, None, f"{type(exc).__name__}: {exc}")
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "ss", "decode_error"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


from ..functions.selfship import self_ship  # noqa: E402

# Worker-executed closures above must never require this package on the
# executor's PYTHONPATH — ship them by value (see functions/selfship.py).
self_ship(__name__)


def audio_frame_energy_int(
    df: DataFrame,
    frame_len: int = 128,
    payload_col: str = "payload",
    modality_col: str = "modality",
    id_col: str = "asset_id",
) -> DataFrame:
    """EXACT integer per-frame energy (Σ sample² as int64) of mono audio
    payloads — the deterministic sibling of ``audio_frame_energy``'s
    float RMS, feeding the landmark fingerprinting path where every
    downstream comparison (peak tests, ratio buckets, magnitude
    buckets) must be integer so Spark and the DuckDB oracle walk the
    same lattice. Channel 0 only (the synth corpus is mono; the real
    contract is per-channel fingerprinting).

    Scale: narrow Arrow-batched ``mapInPandas``; n_samples/frame_len
    rows per asset."""
    schema = f"{id_col} long, frame_idx int, e long, frame_error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, es, errs = [], [], [], []
            for aid, payload, modality in zip(
                pdf[id_col], pdf[payload_col], pdf[modality_col]
            ):
                if modality != "audio":
                    continue
                try:
                    samples, _rate = decode_wav(bytes(payload))
                    mono = samples[:, 0].astype(np.int64)
                    n_frames = mono.size // frame_len
                    frames = mono[: n_frames * frame_len].reshape(
                        n_frames, frame_len
                    )
                    energy = (frames * frames).sum(axis=1)
                    ids += [aid] * n_frames
                    fidx += list(range(n_frames))
                    es += [int(x) for x in energy]
                    errs += [None] * n_frames
                except Exception as exc:  # noqa: BLE001
                    ids.append(aid)
                    fidx.append(-1)
                    es.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "e": es, "frame_error": errs}
            )

    return fan_out(df.select(id_col, payload_col, modality_col)).mapInPandas(
        run, schema=schema
    )


def audio_fingerprint_pairs(
    fe: DataFrame,
    max_dt: int = 4,
    max_key_docs: int = 64,
    min_shared: int = 3,
    id_col: str = "asset_id",
) -> DataFrame:
    """Shazam-style LANDMARK fingerprint matching over the integer
    frame-energy relation: strict local-maximum frames are the
    landmarks; each in-window landmark pair (f2 − f1 <= ``max_dt``)
    hashes to (f1, dt, energy-ratio bucket, magnitude bucket); assets
    sharing >= ``min_shared`` hashes are candidate re-encodes of the
    same audio. Every key component is an integer derived from exact
    energies (ratio bucket by integer division, magnitude bucket as
    bin-string length = floor(log2)+1), so the relation is
    oracle-replayable.

    Hot fingerprint keys (> ``max_key_docs`` assets) are dropped before
    the match self-join — the SAME df-cap discipline as the MinHash
    band and posting joins: candidate volume is bounded by
    n_keys·cap², never all-pairs, whatever the key distribution does.

    Returns (id_a, id_b, n_shared), id_a < id_b.
    """
    good = fe.where(F.col("frame_error").isNull())
    w = Window.partitionBy(id_col).orderBy("frame_idx")
    nb = good.select(
        id_col,
        "frame_idx",
        "e",
        F.lag("e").over(w).alias("ep"),
        F.lead("e").over(w).alias("en"),
    )
    peaks = nb.where(
        F.col("ep").isNotNull()
        & F.col("en").isNotNull()
        & (F.col("e") > F.col("ep"))
        & (F.col("e") > F.col("en"))
    ).select(id_col, "frame_idx", "e")
    a = peaks.select(
        F.col(id_col).alias("aid"), F.col("frame_idx").alias("f1"),
        F.col("e").alias("e1"),
    )
    b = peaks.select(
        F.col(id_col).alias("bid"), F.col("frame_idx").alias("f2"),
        F.col("e").alias("e2"),
    )
    pairs = (
        a.join(
            b,
            (F.col("bid") == F.col("aid"))
            & (F.col("f2") > F.col("f1"))
            & (F.col("f2") <= F.col("f1") + max_dt),
        )
        .select(
            F.col("aid").alias("doc"),
            "f1",
            (F.col("f2") - F.col("f1")).cast("int").alias("dt"),
            F.floor((16 * F.col("e2")) / (F.col("e1") + F.col("e2")))
            .cast("int")
            .alias("rb"),
            F.length(F.bin("e1")).cast("int").alias("lb"),
        )
        .localCheckpoint()  # key census + both sides of the match join
    )
    # cap scales with the corpus (max(base, n_docs/8)) — the synthetic
    # key space is narrow, so a FIXED cap silently empties the match at
    # 10x docs (measured: 0 pairs at sf0.1 with 64); at real scale the
    # key carries spectral peaks and the base cap binds again. The
    # candidate bound n_keys * cap^2 holds either way.
    ndocs = pairs.agg(
        F.countDistinct("doc").cast("long").alias("n_docs_total")
    )
    hot = (
        pairs.groupBy("f1", "dt", "rb", "lb")
        .agg(F.countDistinct("doc").alias("nd"))
        .crossJoin(F.broadcast(ndocs))
        .where(
            F.col("nd")
            > F.greatest(
                F.lit(max_key_docs).cast("long"),
                F.floor(F.col("n_docs_total") / 8).cast("long"),
            )
        )
        .select("f1", "dt", "rb", "lb")
    )
    kept = pairs.join(F.broadcast(hot), ["f1", "dt", "rb", "lb"], "left_anti")
    x = kept.select("f1", "dt", "rb", "lb", F.col("doc").alias("id_a"))
    y = kept.select(
        "f1", "dt", "rb", "lb", F.col("doc").alias("id_b")
    )
    return (
        x.join(y.hint("shuffle_hash"), ["f1", "dt", "rb", "lb"])
        .where(F.col("id_b") > F.col("id_a"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )

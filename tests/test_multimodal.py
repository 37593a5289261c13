"""Multimodal plumbing tests: schema/batching/error isolation of the
pandas-UDF decode path with the deterministic fake decoder."""

from __future__ import annotations

import pytest

from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (
    FEATURE_DIM,
    dedup_by_payload,
    extract_features,
    frame_sample_plan,
    payload_stats,
)
from prefect_flow_arc_alto_to_json_spark.schemas import MULTIMODAL_ASSET_SCHEMA


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("png", 64, 64, None, {})),
        (2, "image", b"\x89PNG-fake-bytes-2", ("png", 32, 32, None, {})),
        (3, "image", b"\x89PNG-fake-bytes-1", ("png", 64, 64, None, {})),  # dup payload
        (4, "audio", b"RIFF-fake", ("wav", None, None, 2500, {})),
        (5, "video", b"\x00\x00ftyp-fake", ("mp4", 640, 360, 3200, {})),
        (6, "image", None, ("png", 1, 1, None, {})),  # corrupt: null payload
    ]
    return spark.createDataFrame(rows, MULTIMODAL_ASSET_SCHEMA)


def test_extract_features_shape_and_errors(assets):
    out = extract_features(assets).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert len(out) == 6
    ok = by_id[1]
    assert ok["decode_error"] is None
    assert ok["feature_dim"] == FEATURE_DIM and len(ok["feature"]) == FEATURE_DIM
    # deterministic: same payload+modality → same features
    assert by_id[1]["feature"] == by_id[3]["feature"]
    assert by_id[1]["feature"] != by_id[2]["feature"]
    # corrupt payload → error row, not task failure
    bad = by_id[6]
    assert bad["feature"] is None and "ValueError" in bad["decode_error"]


def test_payload_stats_jvm_only(assets):
    out = {r["asset_id"]: r for r in payload_stats(assets).collect()}
    assert out[1]["payload_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert out[1]["payload_md5"] == out[3]["payload_md5"]
    assert out[6]["payload_bytes"] is None


def test_dedup_by_payload(assets):
    groups = {r["keeper_id"]: r["n_copies"] for r in dedup_by_payload(assets).collect()}
    assert groups[1] == 2  # assets 1 and 3 share bytes
    assert groups[2] == 1


def test_frame_sample_plan(assets):
    frames = frame_sample_plan(assets.where("modality = 'video'"), every_n_ms=1000)
    ts = sorted(r["frame_ts_ms"] for r in frames.collect())
    assert ts == [0, 1000, 2000, 3000]


# ---------------------------------------------------------------------------
# Real PNG codec (operators/png.py) + the real image decode path
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402

from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (  # noqa: E402
    png_image_decoder,
    pngify_images,
)
from prefect_flow_arc_alto_to_json_spark.operators.png import (  # noqa: E402
    bytes_to_pixels,
    decode_png,
    encode_png,
    png_features,
)


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (40, 7)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_decoder_handles_all_filter_types():
    """Hand-build a PNG whose rows use filters 1-4 (our encoder only emits
    0) — the decoder must read any conforming baseline RGB8 stream."""
    import struct
    import zlib
    from binascii import crc32

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    # filter each row differently: Sub, Up, Average, Paeth
    stride = 4 * 3
    rows = []
    prev = np.zeros(stride, np.int32)
    for y, f in enumerate([1, 2, 3, 4]):
        cur = px[y].reshape(-1).astype(np.int32)
        enc = cur.copy()
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_png_rejects_corruption():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(px)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    tampered = bytearray(good)
    tampered[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(tampered))


def test_png_features_match_pixel_stats():
    px = bytes_to_pixels(b"deterministic-doc-text", side=16)
    feats = png_features(encode_png(px), dim=FEATURE_DIM)
    assert feats[0] == 16.0 and feats[1] == 16.0  # w, h from the real header
    flat = px.reshape(-1, 3).astype(np.float64)
    np.testing.assert_allclose(feats[2:5], flat.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(feats[5:8], flat.std(axis=0), rtol=1e-6)
    assert abs(float(feats[8:16].sum()) - 1.0) < 1e-6  # histogram densities


def test_image_path_decodes_real_png_in_spark(spark, assets):
    """End-to-end: pngify image payloads → real decoder in the Arrow
    kernel; fake-PNG bytes from the fixture become real PNGs, decode
    cleanly, and produce the same features Spark-side as locally."""
    imgs = assets.where("modality = 'image' AND payload IS NOT NULL")
    out = extract_features(pngify_images(imgs), decoder=png_image_decoder)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert rows and all(r["decode_error"] is None for r in rows.values())
    expected = png_features(
        encode_png(bytes_to_pixels(b"\x89PNG-fake-bytes-1")), dim=FEATURE_DIM
    )
    np.testing.assert_allclose(rows[1]["feature"], expected, rtol=1e-6)
    # audio/video rows still go through the stub, with no error
    av = extract_features(
        assets.where("modality <> 'image'"), decoder=png_image_decoder
    ).collect()
    assert all(r["decode_error"] is None for r in av)


def test_resize_images_real_downsample(spark, assets):
    """decode → 8x8 area-mean downsample → re-encode, verified against a
    local numpy reference; non-image rows pass through byte-identical."""
    from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (
        resize_images,
    )

    pngified = pngify_images(assets.where("payload IS NOT NULL"))
    out = {r["asset_id"]: r for r in resize_images(pngified, target=8).collect()}
    assert all(r["resize_error"] is None for r in out.values())
    # image rows: decode the resized bytes, compare with local reference
    src = bytes_to_pixels(b"\x89PNG-fake-bytes-1", side=16)
    expected = (
        src.reshape(8, 2, 8, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    )
    resized = decode_png(bytes(out[1]["payload"]))
    assert resized.shape == (8, 8, 3)
    assert np.array_equal(resized, expected)
    # non-image rows byte-identical
    orig = {r["asset_id"]: bytes(r["payload"])
            for r in pngified.collect() if r["modality"] != "image"}
    for aid, b in orig.items():
        assert bytes(out[aid]["payload"]) == b


def test_resize_images_corrupt_isolated(spark, assets):
    """A non-PNG image payload yields an error row, never a task failure."""
    from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (
        resize_images,
    )

    raw = assets.where("modality = 'image' AND payload IS NOT NULL")
    out = resize_images(raw, target=8).collect()  # payloads are NOT PNGs
    assert all("ValueError" in r["resize_error"] for r in out)


def test_pngify_empty_payload_isolated(spark):
    """An empty image payload (a document with empty text encodes to b'')
    must pass through pngify_images unchanged instead of failing the task
    (round-2 advice: per-row isolation matching resize_images)."""
    rows = [
        (1, "image", b"", ("png", 0, 0, None, {})),
        (2, "image", b"\x89PNG-fake-bytes-1", ("png", 64, 64, None, {})),
        (3, "image", None, ("png", 1, 1, None, {})),
    ]
    df = spark.createDataFrame(rows, MULTIMODAL_ASSET_SCHEMA)
    out = {r["asset_id"]: r for r in pngify_images(df).collect()}
    assert bytes(out[1]["payload"]) == b""  # passthrough, no task failure
    assert out[3]["payload"] is None
    assert decode_png(bytes(out[2]["payload"])).shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# Real WAV codec (operators/wav.py) + the real audio decode path (round-3)
# ---------------------------------------------------------------------------

import struct  # noqa: E402

from prefect_flow_arc_alto_to_json_spark.operators.avi import (  # noqa: E402
    avi_features,
    bytes_to_frames,
    encode_avi,
)
from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (  # noqa: E402
    avify_videos,
    media_decoder,
    wavify_audio,
)
from prefect_flow_arc_alto_to_json_spark.operators.wav import (  # noqa: E402
    SAMPLE_RATE,
    SYNTH_SAMPLES,
    bytes_to_samples,
    decode_wav,
    encode_wav,
    wav_features,
)


def test_wav_roundtrip_sample_exact():
    samples = bytes_to_samples(b"some deterministic payload bytes!", 512)
    blob = encode_wav(samples)
    out, rate = decode_wav(blob)
    assert rate == SAMPLE_RATE
    assert out.shape == (512, 1)
    assert np.array_equal(out[:, 0], samples)


def test_wav_decoder_skips_unknown_chunks():
    """A conforming parser must walk chunks, not assume fmt/data offsets."""
    samples = bytes_to_samples(b"abcdef", 16)
    blob = bytearray(encode_wav(samples))
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    # splice the LIST chunk between WAVE magic and fmt
    spliced = bytes(blob[:12]) + extra + bytes(blob[12:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = decode_wav(spliced)
    assert np.array_equal(out[:, 0], samples) and rate == SAMPLE_RATE


def test_wav_corrupt_inputs_raise():
    samples = bytes_to_samples(b"abcdef", 16)
    good = encode_wav(samples)
    for bad in (
        b"",                                  # empty
        b"RIFX" + good[4:],                   # bad magic
        good[:8] + b"EVAW" + good[12:],       # bad WAVE magic
        good[:-3],                            # truncated data chunk
    ):
        with pytest.raises(ValueError):
            decode_wav(bad)
    # non-PCM format code rejected
    mangled = bytearray(good)
    mangled[20] = 3  # IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(mangled))


def test_wav_features_golden():
    payload = b"golden audio payload"
    feats = wav_features(encode_wav(bytes_to_samples(payload)))
    assert feats.shape == (16,) and feats.dtype == np.float32
    s = bytes_to_samples(payload).astype(np.float64)
    assert feats[0] == np.float32(SAMPLE_RATE)
    assert feats[1] == np.float32(SYNTH_SAMPLES)
    assert feats[2] == np.float32(s.mean())
    assert feats[3] == np.float32(s.std())
    assert feats[4] == np.float32(np.sqrt((s**2).mean()))
    hist, _ = np.histogram(s, bins=8, range=(-32768.0, 32768.0))
    assert np.array_equal(feats[6:14], (hist / s.size).astype(np.float32))


def test_wavify_and_media_decoder_end_to_end(spark, assets):
    """all three modalities → real containers → real parses in the Arrow
    batch: PNG for image, RIFF/PCM for audio, RIFF/AVI for video."""
    reenc = avify_videos(
        wavify_audio(pngify_images(assets.where("payload IS NOT NULL")))
    )
    out = {
        r["asset_id"]: r
        for r in extract_features(reenc, decoder=media_decoder).collect()
    }
    assert all(r["decode_error"] is None for r in out.values())
    aud = out[4]  # RIFF-fake payload, audio modality
    exp = wav_features(encode_wav(bytes_to_samples(b"RIFF-fake")))
    assert np.allclose(aud["feature"], exp, rtol=0, atol=0)
    # video row matches the real AVI encode→decode roundtrip features
    vid = out[5]
    exp_v = avi_features(encode_avi(bytes_to_frames(b"\x00\x00ftyp-fake")))
    assert np.allclose(vid["feature"], exp_v, rtol=0, atol=0)
    assert vid["feature"][0] == np.float32(10.0)  # fps from the AVI header


def test_reencode_media_matches_chained_passes(spark, assets):
    """The fused single-pass re-encode must be byte-identical to the
    pngify→wavify→avify chain it replaces (4 → 2 Python crossings)."""
    from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (
        reencode_media,
    )

    src = assets.where("payload IS NOT NULL")
    fused = {
        r["asset_id"]: bytes(r["payload"]) for r in reencode_media(src).collect()
    }
    chained = {
        r["asset_id"]: bytes(r["payload"])
        for r in avify_videos(wavify_audio(pngify_images(src))).collect()
    }
    assert fused == chained and len(fused) > 0


def test_media_decoder_video_without_avify_errors(spark, assets):
    """A video payload that is NOT an AVI container must become an error
    row, not a task failure — the exact bug class the round-3 driver hash
    caught on mm_features (media_decoder upgraded to real AVI parse while
    the query forgot avify_videos)."""
    vids = assets.where("payload IS NOT NULL AND modality = 'video'")
    rows = extract_features(vids, decoder=media_decoder).collect()
    assert rows and all("RIFF" in r["decode_error"] for r in rows)


from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (  # noqa: E402
    default_fake_decoder,
)


def test_audio_fingerprint_matches_identical_and_rejects_noise(spark):
    """Landmark matching on a planted frame-energy relation: an exact
    re-encode (identical energies, new id) must share EVERY landmark key
    with its source; an unrelated energy profile must share none. Also
    pins the landmark definition: only strict interior local maxima
    fingerprint (a monotone ramp yields no peaks, hence no pairs)."""
    from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (
        audio_fingerprint_pairs,
    )

    prof = [10, 500, 20, 30, 900, 40, 50, 700, 60, 25, 650, 30, 15, 800, 35, 20]
    noise = [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20]
    rows = []
    for aid, series in ((1, prof), (2, prof), (3, noise)):
        rows += [(aid, i, e, None) for i, e in enumerate(series)]
    fe = spark.createDataFrame(
        rows, "asset_id long, frame_idx int, e long, frame_error string"
    )
    out = audio_fingerprint_pairs(fe, min_shared=1)
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in out.collect()}
    assert (1, 2) in pairs
    # every landmark-pair key of asset 1 is shared with its clone:
    # peaks at frames 1,4,7,10,13 -> in-window (dt<=4) ordered pairs
    want_keys = sum(
        1
        for i, f1 in enumerate([1, 4, 7, 10, 13])
        for f2 in [1, 4, 7, 10, 13][i + 1 :]
        if f2 - f1 <= 4
    )
    assert pairs[(1, 2)] == want_keys, pairs
    assert not any(3 in k for k in pairs), pairs

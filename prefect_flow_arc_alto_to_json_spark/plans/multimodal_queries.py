"""Multimodal-column queries (SURVEY.md §2.11): image/audio/video as opaque
``binary`` payloads + typed metadata.

The testdata has no binary asset table, so assets are synthesized
deterministically from ``documents`` (payload = UTF-8 bytes of ``text``,
modality cycling by doc_id) — the point of these queries is the *binary
column plumbing* (JVM byte ops, md5 dedup on digests, frame-explode plans,
Arrow-batched decode UDFs), which is identical whatever the bytes are.

Oracle notes: DuckDB ``md5`` hashes the VARCHAR's UTF-8 bytes — the same
bytes Spark's ``md5(encode(text,'UTF-8'))`` hashes, so digests agree;
``strlen`` is DuckDB's byte length (``length`` is characters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.multimodal import (
    dedup_by_payload,
    extract_features,
    frame_sample_plan,
    payload_stats,
)
from ..sources import load_table
from .registry import query

#: modality by doc_id (deterministic, mirrored in the SQL oracles)
_SQL_MODALITY = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


def synth_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal asset rows: payload = utf-8 bytes of text,
    modality cycling, duration for audio/video derived from byte length."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length(payload) * 10).cast("long").alias("duration_ms"),
            F.create_map().cast("map<string,string>").alias("extra"),
        ).alias("meta"),
    )


@query(
    "mm_payload_stats",
    # rotated to the pytest tier in round 7: mm_features/mm_image_near_dup
    # grade the real decode path; the byte-stats twin freed a slot for
    # the grouped-recurrence family (q_holt_linear_trend)
    extra=True,
    oracle=f"""
    SELECT doc_id AS asset_id,
           {_SQL_MODALITY} AS modality,
           CAST(strlen(text) AS INTEGER) AS payload_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM binary triage: byte length + md5 digest per asset — the
    cheap first pass over a 100 TB multimodal corpus (no decode)."""
    assets = synth_assets(spark, sf_dir)
    return payload_stats(assets).select(
        "asset_id", "modality", "payload_bytes", "payload_md5"
    )


@query(
    "mm_dedup_exact",
    # round-7 rotation: exact dedup is driver-graded via dedup_exact; this binary twin moves to the pytest tier
    extra=True,
    oracle="""
    SELECT md5(text) AS payload_md5,
           CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def mm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup: shuffle only the 128-bit digest, never payloads."""
    return dedup_by_payload(synth_assets(spark, sf_dir))


@query(
    "mm_frame_sample",
    # Rotated to the extra tier in round 7: the multimodal family keeps
    # four graded slots (payload_stats/features/dedup_exact/scene_cuts);
    # the freed slot graded mm_image_near_dup, previously pytest-only.
    extra=True,
    oracle=f"""
    WITH v AS (
      SELECT doc_id AS asset_id, CAST(strlen(text) AS BIGINT) * 10 AS dur
      FROM documents WHERE {_SQL_MODALITY} = 'video'
    )
    SELECT asset_id, CAST(unnest(range(0, greatest(dur, 1), 1000)) AS BIGINT)
             AS frame_ts_ms
    FROM v
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: explode (asset, frame_ts) rows from
    duration metadata; decode stays behind the UDF boundary."""
    assets = synth_assets(spark, sf_dir).where(F.col("modality") == "video")
    return frame_sample_plan(assets, every_n_ms=1000)


def _sql_byte(offset_sql: str) -> str:
    """Byte value at ``offset_sql`` (0-based, SQL expression) of the text's
    UTF-8 bytes, read from the hex dump (DuckDB ``hex()`` emits uppercase)."""
    return (
        f"(strpos('0123456789ABCDEF', substr(hx, 2*({offset_sql}) + 1, 1)) - 1) * 16"
        f" + (strpos('0123456789ABCDEF', substr(hx, 2*({offset_sql}) + 2, 1)) - 1)"
    )


@query(
    "mm_features",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             {_SQL_MODALITY} AS modality,
             text,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
    ),
    img AS (
      -- R-channel mean of the 16x16 tile: pixel k's R byte sits at offset
      -- 3k of the 768-byte buffer, tiled from the text bytes (offset mod len)
      SELECT doc_id, SUM({_sql_byte("(3*k.k) % len")}) / 256.0 AS mean_r
      FROM base, (SELECT unnest(range(0, 256)) AS k) k
      WHERE modality = 'image'
      GROUP BY doc_id
    ),
    aud AS (
      -- sample mean of the 2048 synthesized int16 frames: sample k is the
      -- little-endian byte pair at offsets (2k, 2k+1) of the tiled buffer
      SELECT doc_id,
             SUM(lo + 256 * hi - CASE WHEN hi >= 128 THEN 65536 ELSE 0 END)
               / 2048.0 AS mean_s
      FROM (
        SELECT doc_id,
               {_sql_byte("(2*k.k) % len")} AS lo,
               {_sql_byte("(2*k.k + 1) % len")} AS hi
        FROM base, (SELECT unnest(range(0, 2048)) AS k) k
        WHERE modality = 'audio'
      )
      GROUP BY doc_id
    ),
    vid AS (
      -- R-channel mean over the 4x10x10 synthesized AVI frame stack:
      -- frame-buffer byte j is payload[j % len]; R bytes sit at offsets
      -- 3k for pixel k in 0..399 (4 frames x 100 px)
      SELECT doc_id, SUM({_sql_byte("(3*k.k) % len")}) / 400.0 AS mean_r
      FROM base, (SELECT unnest(range(0, 400)) AS k) k
      WHERE modality = 'video'
      GROUP BY doc_id
    )
    SELECT b.doc_id AS asset_id,
           CAST(16 AS INTEGER) AS feature_dim,
           CAST(NULL AS VARCHAR) AS decode_error,
           ROUND(CASE b.modality WHEN 'image' THEN 16.0
                                 WHEN 'audio' THEN 8000.0
                                 ELSE 10.0 END, 6) AS feat0,
           ROUND(CASE b.modality
                   WHEN 'image' THEN CAST(CAST(i.mean_r AS REAL) AS DOUBLE)
                   WHEN 'audio' THEN CAST(CAST(a.mean_s AS REAL) AS DOUBLE)
                   ELSE CAST(CAST(v.mean_r AS REAL) AS DOUBLE) END, 6) AS feat2
    FROM base b
    LEFT JOIN img i USING (doc_id)
    LEFT JOIN aud a USING (doc_id)
    LEFT JOIN vid v USING (doc_id)
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    All three modalities are REAL containers decoded by real parsers:
    image = PNG (operators/png.py: chunk CRCs, zlib inflate, scanline
    unfilter), audio = WAV (operators/wav.py: RIFF walk, fmt validation,
    int16 PCM frames), video = AVI (operators/avi.py: LIST recursion,
    avih/strh/strf consistency, bottom-up BGR DIB frames). Round 3
    wired the AVI decoder into ``media_decoder`` but forgot to avify the
    synthesized assets, so every video row became a decode-error row and
    the driver's hash flagged it — the oracle catching exactly the class
    of bug it exists for.

    FULL oracle: every codec path is a deterministic bytes → synth →
    encode → decode → statistics roundtrip, so ``feat2`` (image/video:
    R-channel mean; audio: sample mean) is a pure function of the text's
    UTF-8 bytes that DuckDB recomputes from hex-decoded byte values — a
    hash match proves all THREE codec roundtrips are exact against SQL
    ground truth, not just golden-tested. ``feat0`` is the deterministic
    header constant per modality (PNG tile side 16, WAV sample rate
    8000, AVI fps 10). float32 quantization is mirrored with
    CAST(.. AS REAL). Testdata has no empty documents (min text length
    44 at every sf), so the decode-error branch never fires here; error
    isolation is pytest-covered
    (tests/test_multimodal.py::test_pngify_empty_payload_isolated).
    """
    from ..operators.multimodal import media_decoder, reencode_media

    # one fused Arrow pass for all three re-encodes (4 → 2 Python
    # boundary crossings for the whole plan; see reencode_media)
    assets = reencode_media(synth_assets(spark, sf_dir))
    feats = extract_features(assets, decoder=media_decoder)
    return feats.select(
        "asset_id",
        "feature_dim",
        "decode_error",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("feat0"),
        F.round(F.element_at("feature", 3).cast("double"), 6).alias("feat2"),
    )


def _sql_r8(a: str) -> str:
    """R byte of tile pixel at linear position ``a`` (SQL expr) of the
    16x16 synth tile: offset 3*a of the 768-byte buffer, tiled mod len."""
    return _sql_byte(f"(3*({a})) % len")


@query(
    "mm_resize",
    extra=True,
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
      WHERE {_SQL_MODALITY} = 'image'
    ),
    px AS (
      -- output pixel k of the 8x8 resize reads the 2x2 source block whose
      -- top-left tile position is a = 32*(k/8) + 2*(k%8); area-mean with
      -- uint8 truncation == integer division of the 4-byte sum
      SELECT doc_id,
             (({_sql_r8("a")}) + ({_sql_r8("a + 1")})
              + ({_sql_r8("a + 16")}) + ({_sql_r8("a + 17")})) // 4 AS r
      FROM (
        SELECT doc_id, hx, len, 32*(k.k // 8) + 2*(k.k % 8) AS a
        FROM base, (SELECT unnest(range(0, 64)) AS k) k
      )
    )
    SELECT doc_id AS asset_id,
           ROUND(8.0, 6) AS feat0,
           ROUND(CAST(CAST(SUM(r) / 64.0 AS REAL) AS DOUBLE), 6) AS feat2
    FROM px GROUP BY doc_id
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize proven against SQL ground truth: bytes → 16x16
    PNG → decode → 2x2 area-mean downsample to 8x8 → re-encode → decode →
    R-channel mean. The oracle recomputes the whole chain from raw text
    bytes (block mean with uint8 truncation ≡ integer division of the
    4-byte sum), so a hash match certifies decode ∘ encode ∘ resize ∘
    decode ∘ encode is exact — the strongest check available for a binary
    kernel with no SQL-expressible container format (the PNG bytes
    themselves are zlib-compressed; the PIXELS are pure byte math)."""
    from ..operators.multimodal import (
        png_image_decoder,
        pngify_images,
        resize_images,
    )

    assets = pngify_images(synth_assets(spark, sf_dir)).where(
        F.col("modality") == "image"
    )
    resized = resize_images(assets, target=8)
    feats = extract_features(resized, decoder=png_image_decoder)
    return feats.select(
        "asset_id",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("feat0"),
        F.round(F.element_at("feature", 3).cast("double"), 6).alias("feat2"),
    )


@query(
    "mm_audio_energy",
    extra=True,
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
      WHERE {_SQL_MODALITY} = 'audio'
    ),
    s AS (
      SELECT doc_id, k.k // 256 AS frame_idx,
             ({_sql_byte("(2*k.k) % len")})
             + 256 * ({_sql_byte("(2*k.k + 1) % len")})
             - CASE WHEN ({_sql_byte("(2*k.k + 1) % len")}) >= 128
                    THEN 65536 ELSE 0 END AS v
      FROM base, (SELECT unnest(range(0, 2048)) AS k) k
    )
    SELECT doc_id AS asset_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           ROUND(sqrt(SUM(v * v) / 256.0), 6) AS rms,
           CAST(NULL AS VARCHAR) AS frame_error
    FROM s GROUP BY doc_id, frame_idx
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio DSP, oracle-proven: REAL WAV decode → 256-sample
    frame RMS, 8 rows per asset. The oracle recomputes every frame energy
    from little-endian byte pairs of the raw text bytes (sum of squares is
    exact in doubles, /256 is a power of two, sqrt is IEEE-identical), so
    the decode → window → energy chain is verified value-for-value, not
    just shape-tested."""
    from ..operators.multimodal import audio_frame_energy, wavify_audio

    assets = wavify_audio(
        synth_assets(spark, sf_dir).where(F.col("modality") == "audio")
    )
    fe = audio_frame_energy(assets)
    return fe.select(
        "asset_id",
        "frame_idx",
        F.round("rms", 6).alias("rms"),
        "frame_error",
    )


@query(
    "mm_scene_cuts",
    extra=True,
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents WHERE {_SQL_MODALITY} = 'video'
    ),
    fr AS (
      -- frame f pixel k's R byte sits at tiled offset 3*(100*f + k):
      -- the bytes_to_frames layout the AVI roundtrip must preserve
      SELECT doc_id,
             k.k // 100 AS frame_idx,
             SUM({_sql_byte("(3*k.k) % len")}) AS r_sum
      FROM base, (SELECT unnest(range(0, 400)) AS k) k
      GROUP BY 1, 2
    )
    SELECT doc_id AS asset_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(r_sum AS BIGINT) AS r_sum,
           CAST(abs(r_sum - lag(r_sum) OVER w) AS BIGINT) AS delta_prev,
           abs(r_sum - lag(r_sum) OVER w) > 300 AS is_cut
    FROM fr
    WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-change detection over REAL AVI payloads: synth → AVI
    encode → decode (operators/avi.py, full container validation) →
    per-frame R-channel byte sums (operators/multimodal.py:
    video_frame_stats, integer-exact Arrow kernel) → JVM-side lag window
    for inter-frame deltas and the cut flag. The oracle recomputes every
    frame's sum from the raw text bytes via the tiled-offset layout, so
    the hash certifies the whole encode→decode→stat pipeline frame by
    frame — the temporal-analysis complement of mm_features' per-asset
    means.

    Scale: decode is the only Python crossing (one row per frame out);
    the delta window shuffles once on asset_id; threshold logic is pure
    codegen. For hour-long footage swap the synthetic 4-frame stack for
    chunked frame ranges — the plan shape (decode kernel → keyed window)
    is unchanged.
    """
    from ..operators.multimodal import reencode_media, video_frame_stats

    videos = reencode_media(synth_assets(spark, sf_dir)).where(
        F.col("modality") == "video"
    )
    stats = video_frame_stats(videos)
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    delta = F.abs(F.col("r_sum") - F.lag("r_sum").over(w))
    return stats.where(F.col("decode_error").isNull()).select(
        "asset_id",
        "frame_idx",
        "r_sum",
        delta.cast("long").alias("delta_prev"),
        (delta > 300).alias("is_cut"),
    )


@query(
    "mm_image_near_dup",
    # Promoted to the graded window in round 7 (displacing the simpler
    # mm_frame_sample): grades perceptual near-dup banding end-to-end.
    oracle=f"""
    WITH docs0 AS (
      SELECT doc_id, text FROM documents WHERE {_SQL_MODALITY} = 'image'
    ),
    corpus AS (
      SELECT doc_id, text FROM docs0
      UNION ALL
      SELECT doc_id + 1000000, 'Z' || substr(text, 2)
      FROM docs0 WHERE doc_id % 10 = 0
    ),
    base AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM corpus
    ),
    px AS (
      SELECT doc_id, k.k AS k, {_sql_byte("(3*k.k) % len")} AS r
      FROM base, (SELECT unnest(range(0, 256)) AS k) k
    ),
    blk AS (
      SELECT doc_id,
             ((k // 16) // 2) * 8 + (k % 16) // 2 AS b,
             SUM(r) AS bs
      FROM px GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, SUM(bs) AS t FROM blk GROUP BY 1),
    bits AS (
      SELECT blk.doc_id, b,
             CASE WHEN bs * 64 > t THEN 1 ELSE 0 END AS bit
      FROM blk JOIN tot ON blk.doc_id = tot.doc_id
    ),
    words AS (
      SELECT doc_id, b // 16 AS w,
             CAST(SUM(bit * (1 << (b % 16))) AS BIGINT) AS wv
      FROM bits GROUP BY 1, 2
    ),
    sig AS (
      SELECT doc_id,
             MAX(CASE WHEN w = 0 THEN wv END) AS w0,
             MAX(CASE WHEN w = 1 THEN wv END) AS w1,
             MAX(CASE WHEN w = 2 THEN wv END) AS w2,
             MAX(CASE WHEN w = 3 THEN wv END) AS w3
      FROM words GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
              + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3))
              AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
     AND (a.w0 = b.w0 OR a.w1 = b.w1 OR a.w2 = b.w2 OR a.w3 = b.w3)
    WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
        + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3)) <= 3
    """,
)
def mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup over REAL PNG payloads: average-hash
    signatures (operators/multimodal.py:image_ahash_words — integer
    cross-multiplied mean bits from the actual decode) banded into four
    16-bit words, bucket self-join on ANY equal word (pigeonhole: hamming
    <= 3 ⇒ >= 1 identical word, the SimHash chunk-banding argument in
    image space), exact hamming verify via bit_count(xor). Planted
    near-dups: every 10th image re-encoded with its first character
    replaced — a handful of changed pixels, hash distance <= 3 when the
    replaced character was 1-byte (multibyte first chars shift the whole
    tile and legitimately produce a different image; the oracle replays
    the same rule, so both engines agree either way).

    Scale: the quadratic lives only inside word-equality buckets
    (Σ bucket², the LSH-band bound); signatures are 4 longs per asset —
    the shuffle carries 32 bytes per image regardless of image size.
    """
    from ..operators.multimodal import image_ahash_words, pngify_images

    docs0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = docs0.where(F.col("doc_id") % 3 == 0)
    planted = imgs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("Z"), F.expr("substr(text, 2)")).alias("text"),
    )
    corpus = imgs.unionByName(planted).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    sig = image_ahash_words(pngify_images(corpus)).where(
        F.col("decode_error").isNull()
    )
    bands = sig.select(
        "asset_id",
        "w0", "w1", "w2", "w3",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("w"), F.col(f"w{i}").alias("wv"))
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select("asset_id", "w0", "w1", "w2", "w3", "band.w", "band.wv")
    a = bands.select(
        F.col("asset_id").alias("id_a"), "w", "wv",
        *[F.col(f"w{i}").alias(f"a{i}") for i in range(4)],
    )
    b = bands.select(
        F.col("asset_id").alias("id_b"), "w", "wv",
        *[F.col(f"w{i}").alias(f"b{i}") for i in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")))
        for i in range(4)
    )
    return (
        a.join(b, ["w", "wv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= 3)
    )


_LOUD_SS = 166_000_000_000  # frame sum-of-squares threshold (~median)


@query(
    "mm_audio_segments",
    extra=True,
    oracle=f"""
    WITH base AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents WHERE {_SQL_MODALITY} = 'audio'
    ),
    s AS (
      SELECT doc_id, k.k // 256 AS frame_idx,
             ({_sql_byte("(2*k.k) % len")})
             + 256 * ({_sql_byte("(2*k.k + 1) % len")})
             - CASE WHEN ({_sql_byte("(2*k.k + 1) % len")}) >= 128
                    THEN 65536 ELSE 0 END AS v
      FROM base, (SELECT unnest(range(0, 2048)) AS k) k
    ),
    fr AS (
      SELECT doc_id, frame_idx, SUM(v * v) AS ss
      FROM s GROUP BY doc_id, frame_idx
    ),
    flagged AS (
      SELECT doc_id, frame_idx, ss >= {_LOUD_SS} AS is_loud,
             frame_idx - ROW_NUMBER() OVER (
               PARTITION BY doc_id, ss >= {_LOUD_SS} ORDER BY frame_idx
             ) AS isl
      FROM fr
    )
    SELECT doc_id AS asset_id,
           is_loud,
           CAST(MIN(frame_idx) AS INTEGER) AS seg_start,
           CAST(MAX(frame_idx) AS INTEGER) AS seg_end,
           CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM flagged GROUP BY doc_id, is_loud, isl
    """,
)
def mm_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation over REAL WAV payloads — the audio
    member of the temporal-multimodal triple (video: mm_scene_cuts):
    decode (operators/wav.py) → 256-sample frame ENERGY as the exact
    integer sum-of-squares (no sqrt: the loud/quiet threshold compares
    ss directly, so the whole gate is integer arithmetic) → consecutive
    same-state frames merged into maximal segments by the gaps-and-
    islands device (frame_idx − ROW_NUMBER per (asset, state)), the same
    collapse text_dup_spans uses on token grams. The oracle recomputes
    every sample, frame energy, flag, and segment boundary from the raw
    bytes.

    Scale: decode emits 8 integer rows per asset; the islands window
    shuffles once on asset_id; segment output is data-dependent but
    ≤ frames. This is the silence-strip/VAD-prefilter shape that cuts
    audio corpora before any expensive model pass.
    """
    from ..operators.multimodal import audio_frame_sumsq, reencode_media

    audio = reencode_media(synth_assets(spark, sf_dir)).where(
        F.col("modality") == "audio"
    )
    fr = audio_frame_sumsq(audio)
    flagged = fr.where(F.col("decode_error").isNull()).select(
        "asset_id",
        "frame_idx",
        (F.col("ss") >= _LOUD_SS).alias("is_loud"),
    )
    w = Window.partitionBy("asset_id", "is_loud").orderBy("frame_idx")
    isl = F.col("frame_idx") - F.row_number().over(w)
    return (
        flagged.withColumn("isl", isl)
        .groupBy("asset_id", "is_loud", "isl")
        .agg(
            F.min("frame_idx").cast("int").alias("seg_start"),
            F.max("frame_idx").cast("int").alias("seg_end"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .drop("isl")
    )


@query(
    "mm_audio_fingerprint",
    extra=True,
    oracle=f"""
    WITH base AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
      WHERE {_SQL_MODALITY} = 'audio'
    ),
    s AS (
      SELECT doc_id, k.k // 128 AS f,
             ({_sql_byte("(2*k.k) % len")})
             + 256 * ({_sql_byte("(2*k.k + 1) % len")})
             - CASE WHEN ({_sql_byte("(2*k.k + 1) % len")}) >= 128
                    THEN 65536 ELSE 0 END AS v
      FROM base, (SELECT unnest(range(0, 2048)) AS k) k
    ),
    e AS (
      SELECT doc_id, CAST(f AS INT) AS f, CAST(SUM(v * v) AS BIGINT) AS e
      FROM s GROUP BY 1, 2
    ),
    nb AS (
      SELECT doc_id, f, e,
             LAG(e) OVER (PARTITION BY doc_id ORDER BY f) AS ep,
             LEAD(e) OVER (PARTITION BY doc_id ORDER BY f) AS en
      FROM e
    ),
    peaks AS (
      SELECT doc_id, f, e FROM nb
      WHERE ep IS NOT NULL AND en IS NOT NULL AND e > ep AND e > en
    ),
    prs AS (
      SELECT a.doc_id AS doc, a.f AS f1, CAST(b.f - a.f AS INT) AS dt,
             CAST((16 * b.e) // (a.e + b.e) AS INT) AS rb,
             CAST(length(bin(a.e)) AS INT) AS lb
      FROM peaks a JOIN peaks b
        ON b.doc_id = a.doc_id AND b.f > a.f AND b.f <= a.f + 4
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc) AS BIGINT) AS n FROM prs),
    hot AS (
      SELECT f1, dt, rb, lb FROM prs CROSS JOIN nd
      GROUP BY 1, 2, 3, 4, nd.n
      HAVING COUNT(DISTINCT doc) > GREATEST(64, nd.n // 8)
    ),
    kept AS (
      SELECT p.* FROM prs p
      WHERE NOT EXISTS (SELECT 1 FROM hot h
        WHERE h.f1 = p.f1 AND h.dt = p.dt AND h.rb = p.rb AND h.lb = p.lb)
    )
    SELECT x.doc AS id_a, y.doc AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM kept x JOIN kept y
      ON y.f1 = x.f1 AND y.dt = x.dt AND y.rb = x.rb AND y.lb = x.lb
     AND y.doc > x.doc
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shazam-style audio LANDMARK fingerprint matching
    (operators/multimodal.py:audio_frame_energy_int +
    audio_fingerprint_pairs) — the audio member of the perceptual
    near-dup family (mm_image_near_dup covers images): REAL WAV decode →
    exact integer 128-sample frame energies → strict-local-max landmarks
    → in-window landmark-pair keys (f1, Δt, energy-ratio bucket,
    magnitude bucket) → df-capped key join → assets sharing ≥ 3 keys.
    Top matches are the planted near-dup re-encodes (token-jaccard
    0.54–0.73 at the head). Every key component is integer arithmetic
    over exact energies, so the oracle replays decode-to-match from the
    raw byte pairs.

    Scale: energies via one narrow Arrow pass; the match join is
    fingerprint-key-posting-shaped with the SAME >64-doc hot-key cap as
    the MinHash band join — candidate volume n_keys·cap², never
    all-pairs."""
    from ..operators.multimodal import (
        audio_fingerprint_pairs,
        audio_frame_energy_int,
        wavify_audio,
    )

    assets = wavify_audio(
        synth_assets(spark, sf_dir).where(F.col("modality") == "audio")
    )
    fe = audio_frame_energy_int(assets)
    return audio_fingerprint_pairs(fe)

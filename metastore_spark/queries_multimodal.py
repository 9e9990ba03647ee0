"""Multimodal query bindings: binary-typed columns as first-class
query surface.

Two tiers, per SURVEY §2's north-star extensions:
- ``multimodal_binary_dedup`` treats the documents table's text as an
  opaque binary payload (the shape every image/audio/video table has:
  content bytes + typed metadata) and runs content-hash exact dedup
  JVM-side — fully DuckDB-oracled (sha256 over identical bytes).
- ``multimodal_decode_features`` runs the real Arrow pipeline
  (mapInPandas decode → features) over DUAL-format media — real PNGs
  (stdlib codec, full unfilter path) interleaved with the synthetic
  format — and is value-hash-checked end to end: both formats wrap the
  same deterministic pixel payload, so one SQL oracle predicts every
  decoded feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark import multimodal as mm
from metastore_spark.queries import query, _t


@query(
    "multimodal_binary_dedup",
    oracle="""
    SELECT sha256(text)                      AS content_sha256,
           CAST(MIN(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes,
           CAST(MIN(doc_id) AS BIGINT)       AS keep_id,
           CAST(COUNT(*) AS BIGINT)          AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over a BINARY column — the media-table exact
    dedup (SCALE.md 'Multimodal'): sha2 runs JVM-side on the bytes, the
    groupBy shuffles 32-byte keys with partial aggregation, bytes
    themselves never shuffle. Identical shape for images/audio/video;
    here the payload is the utf-8 encoding of documents.text so DuckDB
    can mirror it bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "utf-8")
    return (
        d.select(
            F.lower(F.sha2(content, 256)).alias("content_sha256"),
            F.length(content).cast("bigint").alias("nb"),
            "doc_id",
        )
        .groupBy("content_sha256")
        .agg(
            F.min("nb").alias("n_bytes"),
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "multimodal_decode_features",
    oracle="""
    WITH d AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 1 THEN 'png'
                             WHEN 2 THEN 'jpeg'
                             ELSE 'synth' END AS fmt,
             CASE WHEN doc_id % 3 = 2
                  THEN CAST(16 + (doc_id % 4) * 8 AS INT)
                  ELSE CAST(16 + doc_id % 32 AS INT) END AS w,
             CASE WHEN doc_id % 3 = 2
                  THEN CAST(16 + ((doc_id * 3) % 4) * 8 AS INT)
                  ELSE CAST(16 + (doc_id * 7) % 32 AS INT) END AS h
      FROM documents
    ),
    hx AS (
      SELECT media_id, fmt, w, h,
             sha256(CAST(media_id AS VARCHAR)) AS hex
      FROM d
    ),
    bytes AS (
      SELECT media_id, fmt, w, h,
        -- jpeg rows cycle the digest per 8x8 TILE (n = tile count);
        -- png/synth rows cycle it per PIXEL (n = w*h) — same cyclic
        -- mean formula either way
        CASE WHEN fmt = 'jpeg' THEN (w // 8) * (h // 8)
             ELSE w * h END AS n_units,
        list_transform(range(32), i ->
          (CASE WHEN ord(substr(hex, 2*i+1, 1)) < 58
                THEN ord(substr(hex, 2*i+1, 1)) - 48
                ELSE ord(substr(hex, 2*i+1, 1)) - 87 END) * 16
          + CASE WHEN ord(substr(hex, 2*i+2, 1)) < 58
                 THEN ord(substr(hex, 2*i+2, 1)) - 48
                 ELSE ord(substr(hex, 2*i+2, 1)) - 87 END
        ) AS bv
      FROM hx
    )
    SELECT media_id, fmt,
           w AS width,
           h AS height,
           CAST(w*h AS BIGINT) AS n_pixels,
           ROUND(
             (n_units // 32 * list_sum(bv)
              + COALESCE(list_sum(bv[1:(n_units % 32)]), 0))
             / CAST(n_units AS DOUBLE), 4) AS mean_intensity
    FROM bytes
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRI-format decode/feature-extract, VALUE-hash-checked.

    Per-document media cycles through a REAL PNG (doc_id % 3 == 1 —
    stdlib inflate + 5-filter unfilter, metastore_spark.codecs), a
    REAL baseline JPEG (doc_id % 3 == 2 — full marker walk, canonical
    Huffman entropy decode, dequant + IDCT; round 5), and the FAKEIMG1
    synthetic format. PNG/synth wrap the per-pixel sha256 payload;
    JPEG wraps the per-8×8-tile payload under a unit quant table — the
    one image class a lossy DCT codec reproduces bit-exactly (a flat
    tile is a lone integral DC coefficient), so real lossy-format
    bytes still admit a pure-SQL mean oracle. Any bug in chunk walk,
    inflate, unfilter, Huffman tables, coefficient decode, or the
    IDCT corrupts its format's rows and fails the hash. JPEG dims are
    8-multiples by construction (16..40); decoders are exercised on
    NON-multiple dims and full-entropy content in tests/test_codecs.py
    against the JVM ImageIO reference."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 1, F.lit("png"))
        .when(F.col("doc_id") % 3 == 2, F.lit("jpeg"))
        .otherwise(F.lit("synth"))
        .alias("fmt"),
        F.when(
            F.col("doc_id") % 3 == 2, 16 + (F.col("doc_id") % 4) * 8
        )
        .otherwise(16 + F.col("doc_id") % 32)
        .cast("int")
        .alias("w"),
        F.when(
            F.col("doc_id") % 3 == 2, 16 + ((F.col("doc_id") * 3) % 4) * 8
        )
        .otherwise(16 + (F.col("doc_id") * 7) % 32)
        .cast("int")
        .alias("h"),
    )
    media = mm.synthesize_media(d, fmt_col="fmt")
    feats = mm.decode_image_features(media)
    return (
        feats.join(d.select("media_id", "fmt"), "media_id")
        .select(
            "media_id",
            "fmt",
            "width",
            "height",
            (F.col("width").cast("bigint") * F.col("height")).alias(
                "n_pixels"
            ),
            F.round("mean_intensity", 4).alias("mean_intensity"),
        )
    )


@query(
    "multimodal_decode_oracle",
    oracle="""
    WITH d AS (
      SELECT doc_id AS media_id,
             CAST(16 + doc_id % 32 AS INT)        AS w,
             CAST(16 + (doc_id * 7) % 32 AS INT)  AS h
      FROM documents
    ),
    hx AS (
      SELECT media_id, w, h,
             sha256(CAST(media_id AS VARCHAR)) AS hex
      FROM d
    ),
    bytes AS (
      SELECT media_id, w, h,
        list_transform(range(32), i ->
          (CASE WHEN ord(substr(hex, 2*i+1, 1)) < 58
                THEN ord(substr(hex, 2*i+1, 1)) - 48
                ELSE ord(substr(hex, 2*i+1, 1)) - 87 END) * 16
          + CASE WHEN ord(substr(hex, 2*i+2, 1)) < 58
                 THEN ord(substr(hex, 2*i+2, 1)) - 48
                 ELSE ord(substr(hex, 2*i+2, 1)) - 87 END
        ) AS bv
      FROM hx
    )
    SELECT media_id,
           w AS width,
           h AS height,
           CAST(16 + w*h AS BIGINT) AS n_bytes,
           ROUND(
             ((w*h) // 32 * list_sum(bv)
              + COALESCE(list_sum(bv[1:((w*h) % 32)]), 0))
             / CAST(w*h AS DOUBLE), 4) AS mean_intensity
    FROM bytes
    """,
)
def multimodal_decode_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode kernel with a VALUE oracle: per-document synthetic
    media (dims derived from doc_id, payload = repeated sha256 digest
    of the id — synth_image_bytes) is built worker-side, decoded by
    the same Arrow mapInPandas pipeline as ``multimodal_decode_features``,
    and every numeric feature (dims from the header, byte size, mean
    intensity over the payload) is hash-checked against a pure-SQL
    mirror of the signature math (hex-pair byte extraction + the
    repeated-digest mean formula) — the PQ-codebook oracle pattern
    applied to binary decode."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (16 + F.col("doc_id") % 32).cast("int").alias("w"),
        (16 + (F.col("doc_id") * 7) % 32).cast("int").alias("h"),
    )
    feats = mm.decode_image_features(mm.synthesize_media(d))
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round("mean_intensity", 4).alias("mean_intensity"),
    )


@query(
    "multimodal_frame_schedule",
    oracle="""
    WITH assets AS (
      SELECT doc_id AS asset_id,
             (n_chars % 300) + 10       AS duration_s,
             CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END AS fps
      FROM documents
    ),
    sized AS (
      SELECT asset_id, duration_s, fps,
             duration_s * fps AS n_frames,
             least(16, duration_s) AS n_samples
      FROM assets
    )
    SELECT asset_id, fps,
           CAST(slot AS INT)                                   AS slot,
           CAST((slot * n_frames) // n_samples AS BIGINT)      AS frame_idx,
           CAST(((slot * n_frames) // n_samples) * 1000 // fps AS BIGINT)
             AS ts_ms
    FROM sized, unnest(generate_series(0, n_samples - 1)) AS t(slot)
    """,
)
def multimodal_frame_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling schedule: per asset, uniformly spread
    sample slots (1/sec capped at 16) mapped to concrete frame indexes
    and millisecond timestamps — the planning half of frame extraction
    (the decode half is the env-stubbed kernel; a real deployment feeds
    this schedule to the ffmpeg/decord mapInPandas stage). Metadata
    (duration, fps) is derived deterministically from the documents
    table so the whole schedule is value-hash oracled. Map-only:
    sequence + explode fuse into the scan, schedules never shuffle."""
    d = _t(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        (F.col("n_chars") % 300 + 10).alias("duration_s"),
        F.when(F.col("doc_id") % 3 == 0, 24)
        .when(F.col("doc_id") % 3 == 1, 25)
        .otherwise(30)
        .alias("fps"),
    )
    sized = assets.select(
        "asset_id",
        "fps",
        (F.col("duration_s") * F.col("fps")).alias("n_frames"),
        F.least(F.lit(16), F.col("duration_s")).alias("n_samples"),
    )
    ex = sized.select(
        "asset_id",
        "fps",
        "n_frames",
        "n_samples",
        F.explode(
            F.sequence(F.lit(0), F.col("n_samples") - 1)
        ).alias("slot"),
    )
    frame_idx = F.expr("(slot * n_frames) div n_samples")
    return ex.select(
        "asset_id",
        "fps",
        F.col("slot").cast("int").alias("slot"),
        frame_idx.cast("bigint").alias("frame_idx"),
        F.expr("((slot * n_frames) div n_samples) * 1000 div fps")
        .cast("bigint")
        .alias("ts_ms"),
    )


# Shared by multimodal_audio_windows (synthetic PCM straight into the
# window kernel) and multimodal_audio_codec_windows (same PCM round-
# tripped through the real RIFF/WAV codec): the signal values are
# identical by construction, so one oracle pins both paths — and any
# codec bug makes the codec twin diverge from this SQL.
_AUDIO_WINDOWS_ORACLE = """
    WITH a AS (
      SELECT doc_id AS asset_id,
             (n_chars % 1000) + 64 AS n_samples,
             sha256(CAST(doc_id AS VARCHAR)) AS hex
      FROM documents
    ),
    bytes AS (
      SELECT asset_id, n_samples,
        list_transform(range(32), i ->
          (CASE WHEN ord(substr(hex, 2*i+1, 1)) < 58
                THEN ord(substr(hex, 2*i+1, 1)) - 48
                ELSE ord(substr(hex, 2*i+1, 1)) - 87 END) * 16
          + CASE WHEN ord(substr(hex, 2*i+2, 1)) < 58
                 THEN ord(substr(hex, 2*i+2, 1)) - 48
                 ELSE ord(substr(hex, 2*i+2, 1)) - 87 END
        ) AS bv
      FROM a
    ),
    wins AS (
      SELECT asset_id, bv,
             unnest(range((n_samples - 32) // 16 + 1)) AS w
      FROM bytes WHERE n_samples >= 32
    ),
    seg AS (
      SELECT asset_id, CAST(w AS INT) AS win_idx,
        list_transform(range(32), j ->
          ((bv[((w*16 + j) % 32) + 1] * (1 + (w*16 + j) // 32)) % 256) - 128
        ) AS s
      FROM wins
    )
    SELECT asset_id, win_idx,
           ROUND(sqrt(list_sum(list_transform(s, x -> x*x)) / 32.0), 4)
             AS rms,
           CAST(list_sum(list_transform(range(1, 32), j ->
             CASE WHEN (s[j+1] >= 0) <> (s[j] >= 0) THEN 1 ELSE 0 END))
             AS INT) AS zero_crossings
    FROM seg
    """


@query("multimodal_audio_windows", oracle=_AUDIO_WINDOWS_ORACLE)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio front-end over synthetic PCM: overlapping 32-sample
    windows (hop 16) → RMS energy + zero-crossing counts per window,
    the classic VAD/energy featurization — run through the same
    Arrow-batched mapInPandas kernel shape as the image decode (swap
    synth_pcm for a codec read and the plan is unchanged). Signal
    length derives from documents metadata, the PCM from the id's
    sha256 digest with an amplitude ramp, so DuckDB mirrors every
    sample and the windows are value-hash checked end-to-end. Output
    cardinality = total signal length / hop; after the parameter
    fan-out exchange (_fan_params — a few scalar columns) the codec
    stage itself is map-only."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        (F.col("n_chars") % 1000 + 64).cast("bigint").alias("n_samples"),
    )
    return mm.audio_window_features(d, window=32, hop=16)


@query("multimodal_audio_codec_windows", oracle=_AUDIO_WINDOWS_ORACLE)
def multimodal_audio_codec_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAME audio front-end driven through a REAL container codec:
    synthesize stage writes each signal as an actual RIFF/WAV file
    (16-bit PCM mono, metastore_spark.codecs.wav_encode), decode stage
    parses the container back (wav_decode: chunk walk, fmt/data
    validation, signed-sample reconstruction) before windowing. Two
    Arrow-batched map-only stages — binary synthesis stands in for an
    object-store fetch exactly like the image pipeline. The oracle is
    the SAME SQL as multimodal_audio_windows because the decoded
    samples provably equal synth_pcm — so any codec defect (header
    arithmetic, pad bytes, sign offset, truncation) breaks the
    value-hash match. Scale: one parameter fan-out exchange
    (_fan_params, scalar columns only), then both codec stages are
    map-only; no data shuffle, no driver materialization; per-row cost is bounded by
    n_samples ≤ 1064 × 2 B."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        (F.col("n_chars") % 1000 + 64).cast("bigint").alias("n_samples"),
    )
    return mm.decode_audio_window_features(
        mm.synthesize_audio(d), window=32, hop=16
    )


@query(
    "multimodal_video_codec_frames",
    oracle="""
    WITH a AS (
      SELECT doc_id AS asset_id,
             2 + (doc_id % 3) AS n_frames,
             CASE WHEN doc_id % 3 = 0 THEN 24
                  WHEN doc_id % 3 = 1 THEN 25 ELSE 30 END AS fps,
             sha256(CAST(doc_id AS VARCHAR)) AS hex
      FROM documents
    ),
    bytes AS (
      SELECT asset_id, n_frames, fps,
        list_transform(range(32), i ->
          (CASE WHEN ord(substr(hex, 2*i+1, 1)) < 58
                THEN ord(substr(hex, 2*i+1, 1)) - 48
                ELSE ord(substr(hex, 2*i+1, 1)) - 87 END) * 16
          + CASE WHEN ord(substr(hex, 2*i+2, 1)) < 58
                 THEN ord(substr(hex, 2*i+2, 1)) - 48
                 ELSE ord(substr(hex, 2*i+2, 1)) - 87 END
        ) AS bv
      FROM a
    ),
    fr AS (
      SELECT asset_id, fps, bv,
             CAST(unnest(range(n_frames)) AS INT) AS frame_idx
      FROM bytes
    )
    SELECT asset_id, frame_idx, 16 AS width, 8 AS height, fps,
           list_sum(list_transform(range(128), k ->
             (bv[((k + frame_idx) % 32) + 1]
              * (1 + (k + frame_idx) // 32)) % 256
           )) / 128.0 AS mean_intensity
    FROM fr
    """,
)
def multimodal_video_codec_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Video frames through a REAL container codec: each asset's
    frames are written as an actual YUV4MPEG2 stream (mono 8-bit,
    metastore_spark.codecs.y4m_encode), then parsed back (y4m_decode:
    header tokens, FRAME markers, plane sizing — ValueError on any
    malformed stream) before per-frame mean-intensity extraction —
    the decode half that multimodal_frame_schedule plans for. Two
    Arrow-batched map-only stages, the same shape as the image and
    audio codec paths; with this, all three modalities run real
    container round-trips. Frame pixels derive from the asset id's
    sha256 digest with a per-frame offset + amplitude ramp, so DuckDB
    mirrors every pixel and the means are value-hash-checked (pixel
    sums are integer-exact in float64; /128 is a power-of-two divide).
    Scale: one parameter fan-out exchange (_fan_params, scalar
    columns only), then map-only; per-row cost bounded by
    n_frames <= 4 x 128 B planes."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        (F.lit(2) + F.col("doc_id") % 3).cast("int").alias("n_frames"),
        F.when(F.col("doc_id") % 3 == 0, 24)
        .when(F.col("doc_id") % 3 == 1, 25)
        .otherwise(30)
        .cast("int")
        .alias("fps"),
    )
    return mm.decode_video_frame_features(
        mm.synthesize_video(d, width=16, height=8)
    )


_RESIZE_GRID_ORACLE = """
    WITH d AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 1 THEN 'png'
                  WHEN doc_id % 3 = 2 THEN 'jpeg'
                  ELSE 'synth' END AS fmt,
             CASE WHEN doc_id % 3 = 2
                  THEN CAST(16 + (doc_id % 4) * 8 AS INT)
                  ELSE CAST(16 + doc_id % 32 AS INT) END AS w,
             CASE WHEN doc_id % 3 = 2
                  THEN CAST(16 + ((doc_id * 3) % 4) * 8 AS INT)
                  ELSE CAST(16 + (doc_id * 7) % 32 AS INT) END AS h
      FROM documents
    ),
    hx AS (
      SELECT media_id, fmt, w, h,
             sha256(CAST(media_id AS VARCHAR)) AS hex
      FROM d
    ),
    bytes AS (
      SELECT media_id, fmt, w, h,
        list_transform(range(32), i ->
          (CASE WHEN ord(substr(hex, 2*i+1, 1)) < 58
                THEN ord(substr(hex, 2*i+1, 1)) - 48
                ELSE ord(substr(hex, 2*i+1, 1)) - 87 END) * 16
          + CASE WHEN ord(substr(hex, 2*i+2, 1)) < 58
                 THEN ord(substr(hex, 2*i+2, 1)) - 48
                 ELSE ord(substr(hex, 2*i+2, 1)) - 87 END
        ) AS bv
      FROM hx
    ),
    grid AS (
      SELECT b.media_id, b.fmt,
             CASE WHEN b.fmt = 'jpeg'
               THEN b.bv[((((u.i // 8) * b.h // 8) // 8) * (b.w // 8)
                          + ((u.i % 8) * b.w // 8) // 8) % 32 + 1]
               ELSE b.bv[(((u.i // 8) * b.h // 8) * b.w
                          + ((u.i % 8) * b.w // 8)) % 32 + 1]
             END AS px
      FROM bytes b, UNNEST(range(64)) u(i)
    )
    SELECT media_id, fmt,
           SUM(px) / 64.0 AS mean_resized
    FROM grid
    GROUP BY media_id, fmt
    """


@query("multimodal_resize_grid", oracle=_RESIZE_GRID_ORACLE)
def multimodal_resize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIZE kernel, value-hash-oracled end-to-end: tri-format media
    (real PNG / real baseline JPEG / synthetic — same corpus rule as
    `multimodal_decode_features`) is decoded, nearest-neighbor
    resampled to an 8×8 thumbnail grid in numpy, re-encoded as PNG
    (`multimodal.resize_media`), and the thumbnails decoded AGAIN for
    their mean intensity. The oracle computes each thumbnail's mean
    straight from the deterministic payload: the nearest-neighbor
    gather index math ((y*h0)//8 row, (x*w0)//8 col, tile lookup for
    the block-flat JPEG payload) is mirrored in SQL, so a bug in
    either decode, the resample indexing, OR the re-encode round-trip
    flips the hash. The mean is emitted UNROUNDED — an integer pixel
    sum divided by 2^6 is exact in float64 on both engines (the video
    oracle's lesson).

    Scale shape: parameter fan-out (_fan_params) then three map-only
    Arrow stages (synthesize → resize → decode); no shuffle touches
    media bytes, and the thumbnail stage is the standard
    vision-pipeline preprocessing step (decode+resize+featurize in
    one pass over object-store bytes)."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 1, F.lit("png"))
        .when(F.col("doc_id") % 3 == 2, F.lit("jpeg"))
        .otherwise(F.lit("synth"))
        .alias("fmt"),
        F.when(
            F.col("doc_id") % 3 == 2, 16 + (F.col("doc_id") % 4) * 8
        )
        .otherwise(16 + F.col("doc_id") % 32)
        .cast("int")
        .alias("w"),
        F.when(
            F.col("doc_id") % 3 == 2, 16 + ((F.col("doc_id") * 3) % 4) * 8
        )
        .otherwise(16 + (F.col("doc_id") * 7) % 32)
        .cast("int")
        .alias("h"),
    )
    media = mm.synthesize_media(d, fmt_col="fmt")
    thumbs = mm.resize_media(media, 8, 8)
    feats = mm.decode_image_features(thumbs)
    return feats.join(d.select("media_id", "fmt"), "media_id").select(
        "media_id", "fmt", F.col("mean_intensity").alias("mean_resized")
    )

"""Driver-visible multimodal queries over the deterministic synthetic
asset table.

The binary mapInPandas decode is not SQL-expressible, but the inputs are
blake2b-seeded deterministic payloads and the decoders are pure Python,
so every query's small output has a FIXED ground truth — registered as
literal-valued oracles (golden-pin-as-oracle, the TRUE-literal
certificate pattern of q_approx_percentile): any regression in the
pixel/PCM/sample-table decode, the pHash/landmark kernels, or the
resize/re-encode path turns the driver row red.  Float aggregates use
DECIMAL-exact accumulation so the rounded constants are
partitioning-independent; per-row float outputs come from the
deterministic per-asset kernels.  The richer per-fixture pins live in
tests/test_multimodal_decode.py and tests/test_streaming_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.columns import decode_assets, make_asset_table
from . import register
from .exact import davg as _davg


#: literal ground truths captured from the deterministic pipelines
_VIDEO_FRAMES_GT = """
    SELECT * FROM (VALUES
      (CAST(5 AS BIGINT), CAST(3 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.2' AS DOUBLE), CAST('0.53991' AS DOUBLE)),
      (CAST(11 AS BIGINT), CAST(4 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.3' AS DOUBLE), CAST('0.523499' AS DOUBLE)),
      (CAST(17 AS BIGINT), CAST(5 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.4' AS DOUBLE), CAST('0.478554' AS DOUBLE)),
      (CAST(23 AS BIGINT), CAST(6 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.5' AS DOUBLE), CAST('0.472529' AS DOUBLE)),
      (CAST(29 AS BIGINT), CAST(7 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.6' AS DOUBLE), CAST('0.50632' AS DOUBLE)),
      (CAST(35 AS BIGINT), CAST(3 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.2' AS DOUBLE), CAST('0.540033' AS DOUBLE)),
      (CAST(41 AS BIGINT), CAST(4 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.3' AS DOUBLE), CAST('0.510692' AS DOUBLE)),
      (CAST(47 AS BIGINT), CAST(5 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.4' AS DOUBLE), CAST('0.488211' AS DOUBLE)),
      (CAST(53 AS BIGINT), CAST(6 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.5' AS DOUBLE), CAST('0.497549' AS DOUBLE)),
      (CAST(59 AS BIGINT), CAST(7 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.6' AS DOUBLE), CAST('0.541264' AS DOUBLE)),
      (CAST(65 AS BIGINT), CAST(3 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.2' AS DOUBLE), CAST('0.505474' AS DOUBLE)),
      (CAST(71 AS BIGINT), CAST(4 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.3' AS DOUBLE), CAST('0.507016' AS DOUBLE)),
      (CAST(77 AS BIGINT), CAST(5 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.4' AS DOUBLE), CAST('0.502819' AS DOUBLE)),
      (CAST(83 AS BIGINT), CAST(6 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.5' AS DOUBLE), CAST('0.490237' AS DOUBLE)),
      (CAST(89 AS BIGINT), CAST(7 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.6' AS DOUBLE), CAST('0.534664' AS DOUBLE)),
      (CAST(95 AS BIGINT), CAST(3 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('0.2' AS DOUBLE), CAST('0.493913' AS DOUBLE))
    ) AS t(asset_id, n_frames, first_ts_s, last_ts_s, avg_feature0)
    ORDER BY asset_id
    """
_PHASH_DEDUP_GT = """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(2 AS BIGINT), CAST(3 AS BIGINT), 'image/png', 'image/bmp', CAST(2 AS INT)),
      (CAST(4 AS BIGINT), CAST(5 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(6 AS BIGINT), CAST(7 AS BIGINT), 'image/png', 'image/bmp', CAST(2 AS INT)),
      (CAST(8 AS BIGINT), CAST(9 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(10 AS BIGINT), CAST(11 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(12 AS BIGINT), CAST(13 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(14 AS BIGINT), CAST(15 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(16 AS BIGINT), CAST(17 AS BIGINT), 'image/png', 'image/bmp', CAST(2 AS INT)),
      (CAST(18 AS BIGINT), CAST(19 AS BIGINT), 'image/png', 'image/bmp', CAST(6 AS INT)),
      (CAST(20 AS BIGINT), CAST(21 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(22 AS BIGINT), CAST(23 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(24 AS BIGINT), CAST(25 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(26 AS BIGINT), CAST(27 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(28 AS BIGINT), CAST(29 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(30 AS BIGINT), CAST(31 AS BIGINT), 'image/png', 'image/bmp', CAST(2 AS INT)),
      (CAST(32 AS BIGINT), CAST(33 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(34 AS BIGINT), CAST(35 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(36 AS BIGINT), CAST(37 AS BIGINT), 'image/png', 'image/bmp', CAST(2 AS INT)),
      (CAST(38 AS BIGINT), CAST(39 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(40 AS BIGINT), CAST(41 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(42 AS BIGINT), CAST(43 AS BIGINT), 'image/png', 'image/bmp', CAST(2 AS INT)),
      (CAST(44 AS BIGINT), CAST(45 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT)),
      (CAST(46 AS BIGINT), CAST(47 AS BIGINT), 'image/png', 'image/bmp', CAST(0 AS INT))
    ) AS t(id_a, id_b, mime_a, mime_b, hamming)
    ORDER BY id_a
    """
_AUDIO_FINGERPRINT_GT = """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(6 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(4 AS BIGINT), CAST(5 AS BIGINT), CAST(6 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(6 AS BIGINT), CAST(7 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(8 AS BIGINT), CAST(9 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(10 AS BIGINT), CAST(11 AS BIGINT), CAST(6 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(12 AS BIGINT), CAST(13 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(14 AS BIGINT), CAST(15 AS BIGINT), CAST(6 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(16 AS BIGINT), CAST(17 AS BIGINT), CAST(2 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(18 AS BIGINT), CAST(19 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(20 AS BIGINT), CAST(21 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(22 AS BIGINT), CAST(23 AS BIGINT), CAST(6 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(24 AS BIGINT), CAST(25 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(26 AS BIGINT), CAST(27 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(28 AS BIGINT), CAST(29 AS BIGINT), CAST(6 AS BIGINT), CAST('1.0' AS DOUBLE)),
      (CAST(30 AS BIGINT), CAST(31 AS BIGINT), CAST(4 AS BIGINT), CAST('1.0' AS DOUBLE))
    ) AS t(id_a, id_b, n_common, jaccard)
    ORDER BY id_a
    """
_IMAGE_RESIZE_GT = """
    SELECT * FROM (VALUES
      ('audio', CAST(16 AS BIGINT), CAST(0 AS BIGINT), CAST('0.064584' AS DOUBLE)),
      ('image', CAST(64 AS BIGINT), CAST(64 AS BIGINT), CAST('0.500835' AS DOUBLE)),
      ('video', CAST(16 AS BIGINT), CAST(0 AS BIGINT), CAST('0.508225' AS DOUBLE))
    ) AS t(modality, n_assets, n_at_target, avg_feature0)
    ORDER BY modality
    """


@register(
    "q_multimodal_decode",
    # The decode itself is not SQL-expressible (binary mapInPandas), but
    # the INPUT is the deterministic blake2b-seeded asset table and the
    # decoders are pure Python — so the per-modality profile has a fixed
    # ground truth, emitted here as a literal-valued oracle (the
    # golden-pin-as-oracle form of q_approx_percentile's TRUE-literal
    # certificate).  Any regression in the PNG/GIF/BMP/JPEG/WAV/MP4
    # decode, the sample-table resolution, or the feature kernel turns
    # this driver row red.  Spark-side avgs are DECIMAL-exact, so the
    # rounded values are partitioning-independent (probe-verified).
    oracle="""
    SELECT * FROM (VALUES
      ('audio', CAST(16 AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(0.126 AS DOUBLE),
       CAST(0.064584 AS DOUBLE)),
      ('image', CAST(64 AS BIGINT), CAST(11.859375 AS DOUBLE),
       CAST(8.890625 AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(0.500342 AS DOUBLE)),
      ('video', CAST(16 AS BIGINT), CAST(208.0 AS DOUBLE),
       CAST(147.0 AS DOUBLE), CAST(0.4875 AS DOUBLE),
       CAST(0.508225 AS DOUBLE))
    ) AS t(modality, n_assets, avg_width, avg_height, avg_duration_s,
           avg_feature0)
    ORDER BY modality
    """,
    priority=1,
    bench=False,  # synthetic in-memory table, not an sf-scaled scan
    doc="Multimodal asset profiling: binary image/audio/video columns -> "
    "one Arrow-batched mapInPandas decode (real header/pixel/PCM decode "
    "where no codec is needed) -> per-modality rollup of dimensions, "
    "duration, and the first feature component.  Payloads never leave "
    "the executors; the aggregate sees only flat decoded columns.  "
    "VALUE-CHECKED against the generator's fixed ground truth (literal "
    "oracle): the asset table is deterministic, so the decoded profile "
    "is a constant any correct decode must reproduce.",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    davg = _davg  # noqa: the shared exact-avg idiom
    assets = make_asset_table(spark, n=96)
    decoded = decode_assets(assets)
    # DECIMAL-exact avgs (order-independent under hash aggregation), so
    # the rounded profile is bit-stable under any partitioning — the
    # precondition for the literal ground-truth oracle below
    return (
        decoded.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.round(F.expr(davg("width", 6)), 6).alias("avg_width"),
            F.round(F.expr(davg("height", 6)), 6).alias("avg_height"),
            F.round(F.expr(davg("duration_s", 9)), 6).alias(
                "avg_duration_s"
            ),
            F.round(F.expr(davg("element_at(feature, 1)", 9)), 6).alias(
                "avg_feature0"
            ),
        )
        .orderBy("modality")
    )


@register(
    "q_video_frames",
    oracle=_VIDEO_FRAMES_GT,  # decode not SQL-expressible; fixed ground truth
    priority=1,
    bench=False,  # synthetic in-memory table, not an sf-scaled scan
    doc="Video frame sampling: MP4 payloads explode to one row per sampled "
    "frame via the resolved stts/stsc/stsz/stco sample table — REAL "
    "per-frame timestamps and byte ranges, features from each frame's "
    "actual mdat bytes, thinned to ~10 frames/second (cap 64; the "
    "synthetic fixtures run sub-second, so 1 fps would keep only the "
    "first frame). The "
    "mapInPandas kernel turns N assets into ~N·fps rows without the "
    "payloads ever leaving the executors — the canonical shape for frame "
    "extraction over a 100 TB video corpus. Frame-level values are "
    "pinned by tests/test_multimodal_decode.py.",
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import sample_frames

    assets = make_asset_table(spark, n=96)
    frames = sample_frames(assets, every_s=0.1)
    return (
        frames.groupBy("asset_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.round(F.min("frame_ts_s"), 3).alias("first_ts_s"),
            F.round(F.max("frame_ts_s"), 3).alias("last_ts_s"),
            # DECIMAL-exact per-asset avg: order-independent, so the
            # literal ground-truth oracle is partitioning-safe
            F.round(
                F.expr(_davg("element_at(feature, 1)", 9)), 6
            ).alias("avg_feature0"),
        )
        .orderBy("asset_id")
    )


@register(
    "q_phash_dedup",
    oracle=_PHASH_DEDUP_GT,  # decode not SQL-expressible; fixed ground truth
    priority=1,
    bench=False,  # synthetic in-memory table, not an sf-scaled scan
    doc="Perceptual-hash image dedup: every decodable image payload -> "
    "64-bit pHash (32×32 luminance DCT, low-frequency signs) in one "
    "mapInPandas pass, then 8-band×8-bit LSH candidates and an exact "
    "bit_count(xor) verify at Hamming <= 6 (pigeonhole: recall is total "
    "for <= 7).  Run over a corpus with planted CROSS-FORMAT "
    "near-duplicates — the same picture as gray PNG and as ±3-noise "
    "24-bit BMP — the transcoded-copy case byte/exact dedup can never "
    "catch.  Value pins (every planted pair found, zero false pairs, "
    "known hash bits) live in tests/test_multimodal_decode.py.",
)
def q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import (
        make_near_dup_assets,
        phash_assets,
        phash_near_pairs,
    )

    assets = make_near_dup_assets(spark, n_pairs=24)
    return phash_near_pairs(phash_assets(assets)).orderBy("id_a", "id_b")


@register(
    "q_audio_fingerprint",
    oracle=_AUDIO_FINGERPRINT_GT,  # extraction not SQL-expressible; fixed ground truth
    priority=1,
    bench=False,  # synthetic in-memory table, not an sf-scaled scan
    doc="Audio near-dup dedup by spectral-landmark fingerprinting "
    "(Shazam-style constellation): every decodable PCM payload -> "
    "amplitude-gated per-band FFT peak-pair tokens in one mapInPandas "
    "pass, then the TEXT dedup package's inverted-index algebra verbatim "
    "(posting lists, codegen pair explosion, integer 3/5-Jaccard "
    "threshold) finds re-recorded/noisy copies.  Run over planted "
    "clean/noisy 3-tone pairs; every planted pair recovered with zero "
    "false pairs (pinned in tests/test_multimodal_decode.py).  The "
    "composition is the point: modality-specific extraction feeds the "
    "same scale-safe dedup kernel text uses.",
)
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import (
        audio_near_pairs,
        fingerprint_audio,
        make_near_dup_audio,
    )

    assets = make_near_dup_audio(spark, n_pairs=16)
    return audio_near_pairs(fingerprint_audio(assets)).orderBy("id_a", "id_b")


@register(
    "q_image_resize",
    oracle=_IMAGE_RESIZE_GT,  # pipeline not SQL-expressible; fixed ground truth
    priority=1,
    bench=False,  # synthetic in-memory table, not an sf-scaled scan
    doc="Image normalization pipeline end-to-end: the mixed-format asset "
    "table (PNG/GIF/BMP/JPEG + audio/video passthrough) runs through "
    "resize_images(16x12) — REAL nearest-neighbor resampling of decoded "
    "luminance, re-encoded as genuine PNG — and the output is "
    "decode_assets'd AGAIN to prove every image now reads back at the "
    "target dimensions from its real header while non-images pass "
    "through untouched.  Two chained mapInPandas passes, payloads never "
    "leave the executors — the canonical preprocessing shape for "
    "vision-model training corpora.",
)
def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import resize_images

    assets = make_asset_table(spark, n=96)
    resized = resize_images(assets, 16, 12)
    decoded = decode_assets(resized)
    return (
        decoded.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.count_if(
                (F.col("width") == 16) & (F.col("height") == 12)
            ).alias("n_at_target"),
            F.round(
                F.expr(_davg("element_at(feature, 1)", 9)), 6
            ).alias("avg_feature0"),
        )
        .orderBy("modality")
    )

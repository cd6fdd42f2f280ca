"""Driver-visible multimodal query: decode a deterministic synthetic asset
table and profile it per modality.

No DuckDB oracle is possible — the asset payloads are binary columns
decoded by a mapInPandas kernel (multimodal/columns.py), which SQL cannot
express — so this registers as a rows-only check; the value-level pins
live in tests/test_multimodal_decode.py and
tests/test_streaming_multimodal.py (fixture-pinned real header/pixel/PCM
decode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.columns import decode_assets, make_asset_table
from . import register


@register(
    "q_multimodal_decode",
    oracle=None,  # binary mapInPandas decode: not SQL-expressible
    priority=1,
    bench=False,  # synthetic in-memory table, not an sf-scaled scan
    doc="Multimodal asset profiling: binary image/audio/video columns -> "
    "one Arrow-batched mapInPandas decode (real header/pixel/PCM decode "
    "where no codec is needed) -> per-modality rollup of dimensions, "
    "duration, and the first feature component.  Payloads never leave "
    "the executors; the aggregate sees only flat decoded columns.",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = make_asset_table(spark, n=96)
    decoded = decode_assets(assets)
    return (
        decoded.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(F.avg("duration_s"), 6).alias("avg_duration_s"),
            F.round(F.avg(F.element_at("feature", 1)), 6).alias(
                "avg_feature0"
            ),
        )
        .orderBy("modality")
    )


@register(
    "q_video_frames",
    oracle=None,  # binary mapInPandas frame explode: not SQL-expressible
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
            F.round(F.avg(F.element_at("feature", 1)), 6).alias(
                "avg_feature0"
            ),
        )
        .orderBy("asset_id")
    )


@register(
    "q_phash_dedup",
    oracle=None,  # binary pixel decode + DCT: not SQL-expressible
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
    oracle=None,  # FFT landmark extraction: not SQL-expressible
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
    oracle=None,  # binary decode→resample→re-encode: not SQL-expressible
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
            F.round(F.avg(F.element_at("feature", 1)), 6).alias(
                "avg_feature0"
            ),
        )
        .orderBy("modality")
    )

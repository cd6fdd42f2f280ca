"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing here — schemas, batch shapes, partitioning-safe UDF
signatures — is real and tested.  The codec step itself (JPEG decode, audio
resample, video frame extraction) requires native libraries that are not in
this environment, so each kernel calls a ``decoder`` callable that defaults
to :func:`deterministic_fake_decode`, a clearly-marked stand-in that derives
stable pseudo-features from the bytes (so tests pin exact values).  Swapping
in a real decoder (Pillow/ffmpeg/torchaudio) changes one constructor
argument and nothing else.

Design-for-scale notes:
  * binary payloads stay in the executor — no collect, no driver transfer;
  * ``mapInPandas`` streams Arrow batches, so one task holds at most
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads in memory —
    tune that (not the code) for big blobs, or repartition upstream so a
    task's batch fits the executor heap;
  * derived features land in flat columns → downstream is plain Catalyst.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: lake schema for a multimodal asset table
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

#: feature-vector length produced by decoders
FEATURE_DIM = 8

Decoder = Callable[[bytes, str], dict]


def deterministic_fake_decode(content: bytes, modality: str) -> dict:
    """STAND-IN for a real codec (Pillow / ffmpeg are not installed here).

    Derives stable pseudo-metadata from a BLAKE2b of the payload so the
    Spark plumbing (schema, batching, partitioning) is exercised end-to-end
    with assertable outputs.  A real decoder returns the same dict shape.
    """
    h = hashlib.blake2b(content, digest_size=16).digest()
    w, x, y, z = struct.unpack("<IIII", h)
    feature = np.frombuffer(
        hashlib.blake2b(content, digest_size=FEATURE_DIM * 8).digest(), dtype="<u8"
    )
    return {
        "width": int(16 + w % 4096) if modality in ("image", "video") else None,
        "height": int(16 + x % 4096) if modality in ("image", "video") else None,
        "n_channels": int(1 + y % 4),
        "duration_s": round(z % 3_600_000 / 1000.0, 3)
        if modality in ("audio", "video")
        else None,
        "feature": (feature / np.uint64(1) / 2**64).tolist(),
    }


def decode_assets(
    assets: DataFrame, decoder: Decoder = deterministic_fake_decode
) -> DataFrame:
    """binary column → typed metadata + feature vector via one Arrow-batched
    pass; tasks never see more than one Arrow batch of payloads at a time."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                d = decoder(bytes(content), modality)
                out.append({"asset_id": aid, "modality": modality, **d})
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return assets.select("asset_id", "modality", "content").mapInPandas(
        kernel, DECODED_SCHEMA
    )


def sample_frames(
    assets: DataFrame,
    every_s: float = 1.0,
    decoder: Decoder = deterministic_fake_decode,
) -> DataFrame:
    """Video → one row per sampled frame timestamp (frame payload decode is
    the same stand-in; the explode/batch shape is the real contract)."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_ts_s", DoubleType()),
            StructField("feature", ArrayType(DoubleType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "video":
                    continue
                d = decoder(bytes(content), modality)
                dur = d["duration_s"] or 0.0
                n = max(1, min(int(dur / every_s), 64))
                for i in range(n):
                    f = decoder(bytes(content) + str(i).encode(), "image")
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_ts_s": round(i * every_s, 3),
                            "feature": f["feature"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return assets.select("asset_id", "modality", "content").mapInPandas(
        kernel, schema
    )


def make_asset_table(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table (no real media libs in env)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        content = hashlib.blake2b(str(i).encode(), digest_size=64).digest() * (
            1 + i % 7
        )
        rows.append(
            (i, modality, f"application/x-fake-{modality}", bytearray(content), "{}")
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA).repartition(8, "asset_id")


def cosine_to_query(decoded: DataFrame, query: list[float]) -> DataFrame:
    """Feature-space similarity of decoded assets to a query vector — pure
    Catalyst fold over the feature array (no Python)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.expr(
        "aggregate(zip_with(feature, _q, (a, b) -> a * b), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x)"
    )
    nf = F.sqrt(
        F.expr(
            "aggregate(feature, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"
        )
    )
    nq = F.sqrt(
        F.expr("aggregate(_q, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)")
    )
    return (
        decoded.withColumn("_q", q)
        .withColumn("cosine", dot / (nf * nq))
        .drop("_q")
    )

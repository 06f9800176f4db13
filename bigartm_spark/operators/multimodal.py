"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque `binary` columns + typed metadata, processed with
Arrow-batched mapInPandas (the only sane shape for per-asset Python work
at scale: batch-size-bounded memory, no driver collect, partition-level
parallelism). Decode is injected via `decode_fn`:

- `operators/codecs.py` decode_media/resize_media — REAL pure-Python
  decoders for the uncompressed formats (PPM, 24-bit BMP, WAV-PCM),
  end-to-end testable in this container;
- `fake_decode` (default) — deterministic digest-derived stand-in for
  arbitrary bytes;
- compressed codecs (JPEG/PNG/MP3/...) raise NotImplementedError until
  a PIL/ffmpeg-backed decode_fn is injected (no such libs here).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def fake_decode(content: bytes, media_type: str, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive `dim` floats from
    the content digest. Swap for PIL/torchaudio/ffmpeg in production."""
    h = hashlib.sha256(content).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1_000_003).astype(np.float32) / 1_000_003.0


def strict_decode(content: bytes, media_type: str, dim: int = 8) -> np.ndarray:
    """Real decode for in-container codecs (PPM/BMP/WAV-PCM via
    operators/codecs.py); NotImplementedError for compressed formats."""
    from bigartm_spark.operators.codecs import decode_media

    return decode_media(content, media_type, dim)


def docs_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for the driver testdata: wrap document text bytes as fake
    'image' assets so the pipeline is exercised end-to-end."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit(64).alias("meta_width"),
        F.lit(64).alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
    dim: int = 8,
) -> DataFrame:
    """mapInPandas feature extraction: decode -> fixed-dim float vector +
    integrity metadata. Arrow batch shape: one pandas frame per ~64k rows;
    memory is bounded by batch size regardless of partition size."""

    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, nb = [], [], []
            for content in pdf["content"]:
                b = bytes(content)
                nb.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                feats.append(decode_fn(b, "image", dim))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nb,
                    "content_sha256": shas,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.FloatType()), False),
    ]
)


def fake_resize(
    content: bytes, media_type: str, width: int, height: int
) -> np.ndarray:
    """Deterministic stand-in for decode+resize: a width*height float
    raster derived from the content digest (swap for PIL in production;
    the Spark-side batching/schema is what this module makes real)."""
    return fake_decode(content, media_type, dim=width * height)


def resize_images(
    media: DataFrame,
    width: int = 16,
    height: int = 16,
    resize_fn: Callable[[bytes, str, int, int], np.ndarray] = fake_resize,
) -> DataFrame:
    """mapInPandas image resize: binary -> fixed (width x height) float
    raster. Output row size is fixed by (width, height), so executor
    memory is batch-bounded no matter the input asset sizes."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pix = [
                resize_fn(bytes(c), mt, width, height)
                for c, mt in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "out_width": width,
                    "out_height": height,
                    "pixels": pix,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: expand each audio asset into
    (chunk_start_ms, chunk_end_ms) rows — pure Column expressions, the
    decode happens downstream. Non-audio rows pass through as one
    full-span chunk."""
    is_audio = (F.col("media_type") == "audio") & F.col(
        "meta_duration_ms"
    ).isNotNull()
    starts = F.when(
        is_audio,
        F.sequence(F.lit(0), F.col("meta_duration_ms") - 1, F.lit(chunk_ms)),
    ).otherwise(F.array(F.lit(0)))
    out = media.select(
        "asset_id",
        "media_type",
        "meta_duration_ms",
        F.explode(starts).alias("chunk_start_ms"),
    )
    return out.select(
        "asset_id",
        "media_type",
        "chunk_start_ms",
        F.when(
            F.col("meta_duration_ms").isNotNull(),
            F.least(
                F.col("chunk_start_ms") + F.lit(chunk_ms),
                F.col("meta_duration_ms"),
            ),
        )
        .otherwise(F.col("chunk_start_ms"))
        .alias("chunk_end_ms"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video asset into frame
    timestamps (decode stubbed). Pure Column expressions — the expensive
    decode happens downstream in extract_features."""
    frames = F.when(
        (F.col("media_type") == "video") & F.col("meta_duration_ms").isNotNull(),
        F.sequence(
            F.lit(0), F.col("meta_duration_ms"), F.lit(every_ms)
        ),
    ).otherwise(F.array(F.lit(0)))
    return media.select(
        "asset_id",
        "media_type",
        F.explode(frames).alias("frame_ts_ms"),
    )

"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque `binary` columns + typed metadata, processed with
Arrow-batched mapInPandas (the only sane shape for per-asset Python work
at scale: batch-size-bounded memory, no driver collect, partition-level
parallelism). Decode is injected via `decode_fn`:

- `operators/codecs.py` decode_media/resize_media — REAL pure-Python
  decoders (PPM, 24-bit BMP, PNG, baseline JPEG, GIF, WAV-PCM,
  AVI-MJPEG via operators/{jpeg,gifavi}.py), end-to-end testable in
  this container;
- `fake_decode` (default) — deterministic digest-derived stand-in for
  arbitrary bytes;
- remaining compressed codecs (progressive JPEG/MP3/non-MJPEG video)
  raise NotImplementedError until a PIL/ffmpeg-backed decode_fn is
  injected (no such libs here).
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


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_rgb", T.ArrayType(T.FloatType()), False),
        T.StructField("mean_luma", T.FloatType(), False),
    ]
)


def video_frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling: decode AVI/MJPEG (operators/gifavi.py
    riding the baseline-JPEG decoder) or animated GIF bytes, keep one
    frame per `every_ms` of timeline, and emit per-frame pixel features.
    The plan-only twin (`frame_sample_plan`) stays for metadata-driven
    scheduling; this operator reads the actual pixels. mapInPandas keeps
    executor memory batch-bounded; one output row per sampled frame, so
    a 1h video at 1 fps sampling emits 3600 rows regardless of source
    size. Undecodable/non-video rows are dropped (corrupt-asset filter
    semantics, matching image_content_features)."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bigartm_spark.operators.codecs import sniff_media
        from bigartm_spark.operators.gifavi import (
            avi_frames,
            gif_frames,
            sample_frames,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "frame_index", "frame_ts_ms", "width",
                "height", "mean_rgb", "mean_luma",
            )}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                try:
                    kind = sniff_media(b)
                    if kind == "avi":
                        pairs = avi_frames(b)
                    elif kind == "gif":
                        pairs = gif_frames(b)
                        # GIF delays are per-frame gaps; make absolute
                        ts, acc = [], 0
                        for delay, frame in pairs:
                            ts.append((acc, frame))
                            acc += max(delay, 10)
                        pairs = ts
                    else:
                        continue
                except Exception:
                    continue
                for i, (ts_ms, frame) in enumerate(
                    sample_frames(pairs, every_ms)
                ):
                    px = frame.astype(np.float64)
                    out["asset_id"].append(int(aid))
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(int(ts_ms))
                    out["height"].append(frame.shape[0])
                    out["width"].append(frame.shape[1])
                    out["mean_rgb"].append(
                        px.reshape(-1, 3).mean(axis=0).astype(np.float32)
                    )
                    out["mean_luma"].append(
                        float(
                            (px.reshape(-1, 3) @ np.array([0.299, 0.587, 0.114])).mean()
                        )
                    )
            if out["asset_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(run, VIDEO_FRAME_SCHEMA)


# ------------------------------------------------- real content features
#
# Typed per-modality feature extraction over the in-container codecs
# (operators/codecs.py PPM/BMP/WAV-PCM): unlike fake_decode's
# digest-derived vectors these read the actual pixels/samples, so the
# multimodal column type is end-to-end real for uncompressed formats.
# Compressed codecs keep the documented NotImplementedError contract of
# strict_decode.

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_rgb", T.ArrayType(T.FloatType()), False),
        T.StructField("std_rgb", T.ArrayType(T.FloatType()), False),
        T.StructField("luma_hist", T.ArrayType(T.FloatType()), False),
        T.StructField("aspect_ratio", T.FloatType(), False),
    ]
)


def image_content_features(media: DataFrame, hist_bins: int = 8) -> DataFrame:
    """Decode image bytes (PPM/P6 or 24-bit BMP, sniffed) and compute
    per-channel mean/std, a normalized luminance histogram, and the
    aspect ratio — all vectorized numpy over the decoded raster.
    mapInPandas keeps executor memory batch-bounded; rows that fail to
    decode (unknown/compressed codec) are dropped, mirroring a corrupt
    asset filter in a real media pipeline."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bigartm_spark.operators.codecs import (
            _IMAGE_DECODERS,
            sniff_media,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "width", "height", "mean_rgb", "std_rgb",
                "luma_hist", "aspect_ratio",
            )}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                try:
                    decoder = _IMAGE_DECODERS.get(sniff_media(b))
                    img = decoder(b) if decoder else None
                except Exception:
                    img = None
                if img is None:
                    continue
                px = img.astype(np.float64)
                # ITU-R BT.601 luma from the RGB planes
                luma = px @ np.array([0.299, 0.587, 0.114])
                hist, _ = np.histogram(luma, bins=hist_bins, range=(0, 255))
                h, w = img.shape[0], img.shape[1]
                out["asset_id"].append(int(aid))
                out["width"].append(w)
                out["height"].append(h)
                out["mean_rgb"].append(
                    px.reshape(-1, 3).mean(axis=0).astype(np.float32)
                )
                out["std_rgb"].append(
                    px.reshape(-1, 3).std(axis=0).astype(np.float32)
                )
                out["luma_hist"].append(
                    (hist / max(luma.size, 1)).astype(np.float32)
                )
                out["aspect_ratio"].append(float(w) / float(h))
            if out["asset_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("num_channels", T.IntegerType(), False),
        T.StructField("duration_s", T.FloatType(), False),
        T.StructField("rms", T.FloatType(), False),
        T.StructField("zero_crossing_rate", T.FloatType(), False),
        T.StructField("spectral_centroid_hz", T.FloatType(), False),
        T.StructField("spectral_rolloff_hz", T.FloatType(), False),
    ]
)


def audio_content_features(
    media: DataFrame, rolloff: float = 0.85
) -> DataFrame:
    """Decode WAV-PCM16 bytes and compute the standard scalar audio
    descriptors: RMS energy (normalized to [-1, 1] full scale),
    zero-crossing rate, and spectral centroid / rolloff from one
    magnitude spectrum (numpy rfft — no external DSP dependency).
    Channels are averaged to mono first. Undecodable rows are dropped
    (same corrupt-asset contract as image_content_features)."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bigartm_spark.operators.codecs import decode_audio

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "sample_rate", "num_channels", "duration_s",
                "rms", "zero_crossing_rate", "spectral_centroid_hz",
                "spectral_rolloff_hz",
            )}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                try:
                    samples, sr, nch = decode_audio(bytes(content))
                except Exception:
                    continue
                if samples.size == 0:
                    continue
                x = samples.astype(np.float64).reshape(-1, nch).mean(axis=1)
                x /= 32768.0
                n = x.size
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = (
                    float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    / max(n - 1, 1)
                )
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                total = mag.sum()
                centroid = float((freqs * mag).sum() / total) if total else 0.0
                if total:
                    cum = np.cumsum(mag)
                    roll = float(freqs[np.searchsorted(cum, rolloff * total)])
                else:
                    roll = 0.0
                out["asset_id"].append(int(aid))
                out["sample_rate"].append(int(sr))
                out["num_channels"].append(int(nch))
                out["duration_s"].append(float(n) / sr)
                out["rms"].append(rms)
                out["zero_crossing_rate"].append(zcr)
                out["spectral_centroid_hz"].append(centroid)
                out["spectral_rolloff_hz"].append(roll)
            if out["asset_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)

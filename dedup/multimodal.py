"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched UDFs over mapInPandas.

Images are fully real in this sandbox (pure-numpy codecs in imaging.py):
decode, resize, feature-extract (pHash + mean-color). Audio/video decoding
needs codec libraries that are NOT in this container, so those kernels are
STUBS behind a deterministic fake (seeded from the payload hash) with the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch shape —
real and tested. Swap `_decode_audio_stub`/`_sample_frames_stub` for
soundfile/PyAV on a production cluster; nothing else changes."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from . import imaging

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)

VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_phash", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


# ------------------------------------------------------------------ images


def image_features(images: DataFrame, thumb: int = 8) -> DataFrame:
    """Decode -> resize(thumb) -> feature-extract, one Arrow batch at a time.
    REAL implementation (numpy codecs); the template for all media kernels."""

    def run(batches):
        for pdf in batches:
            rows = []
            for iid, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                px = imaging.decode_image(data, fmt, w, h)
                small = imaging._area_resize(imaging._to_gray(px), thumb)
                rows.append(
                    {
                        "image_id": iid,
                        "phash": imaging.phash_to_signed64(imaging.phash64(px)),
                        "mean_r": float(px[:, :, 0].mean()),
                        "mean_g": float(px[:, :, 1].mean()),
                        "mean_b": float(px[:, :, 2].mean()),
                        "thumb_w": small.shape[1],
                        "thumb_h": small.shape[0],
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


# ------------------------------------------------------------- audio (stub)


def _decode_audio_stub(data: bytes, n_samples: int = 4096) -> np.ndarray:
    """STUB: no audio codecs in this container (no soundfile/librosa/ffmpeg).
    Deterministic fake: PCM synthesized from the payload's sha256 so the
    distributed plumbing is exercised end-to-end with stable outputs.
    Production: replace body with `soundfile.read(io.BytesIO(data))`."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_samples).astype(np.float32)


def audio_features(media: DataFrame, id_col: str = "media_id", bytes_col: str = "bytes") -> DataFrame:
    def run(batches):
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                pcm = _decode_audio_stub(bytes(data))
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": int(pcm.size),
                        "rms": float(np.sqrt((pcm.astype(np.float64) ** 2).mean())),
                        "zero_crossings": int((np.diff(np.signbit(pcm)) != 0).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# ------------------------------------------------------------- video (stub)


def _sample_frames_stub(data: bytes, n_frames: int, size: int = 32) -> list[np.ndarray]:
    """STUB: no video codecs in this container (no PyAV/opencv/ffmpeg).
    Deterministic fake frames seeded from the payload hash + frame index.
    Production: replace body with PyAV keyframe sampling."""
    out = []
    base = hashlib.sha256(data).digest()
    for i in range(n_frames):
        seed = int.from_bytes(hashlib.sha256(base + i.to_bytes(4, "big")).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        out.append(rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8))
    return out


def video_frame_phashes(
    media: DataFrame, n_frames: int = 3, id_col: str = "media_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Frame-sample -> per-frame pHash (the video dedup signature source)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                for i, frame in enumerate(_sample_frames_stub(bytes(data), n_frames)):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_phash": imaging.phash_to_signed64(imaging.phash64(frame)),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, VIDEO_FRAMES_SCHEMA)

"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media alongside text. The
engine treats media as ``binary`` columns with a typed metadata struct and
runs decode/feature-extract/resize/frame-sample as **Arrow-batched
``mapInPandas``** stages — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested; the codec itself is
stubbed (this container ships no image/audio libs) behind a deterministic
fake so tests are reproducible, with the library import gated by
``try/except`` so dropping in Pillow/soundfile/PyAV on a real cluster
activates true decoding without touching any caller.

Schema convention::

    media(media_id string, kind string,          -- 'image'|'audio'|'video'
          payload binary,                        -- opaque encoded bytes
          meta struct<width:int, height:int, sample_rate:int,
                      n_frames:int, mime:string>)

Scale notes: payloads never pass through Python row-at-a-time — each
``mapInPandas`` call receives a pandas batch whose ``payload`` column is an
Arrow binary array (zero-copy from the JVM). Batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; repartition by
``media_id`` upstream if payload sizes are skewed (one 4 GB video in a
partition of thumbnails stalls the stage).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image to an HxWx3 uint8 array.

    Real path: Pillow (unavailable here). Deterministic fake: an 8×8×3
    array seeded from the payload hash — stable across runs/partitions so
    downstream features are testable.
    """
    try:  # pragma: no cover - Pillow not in this container
        import io

        from PIL import Image  # type: ignore

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        digest = hashlib.sha256(payload).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _decode_audio(payload: bytes, sample_rate: int) -> np.ndarray:
    """Decode audio to mono float32 PCM. Real path: soundfile; fake:
    1024 deterministic samples seeded from the payload hash."""
    try:  # pragma: no cover - soundfile not in this container
        import io

        import soundfile as sf  # type: ignore

        data, _ = sf.read(io.BytesIO(payload), dtype="float32")
        return data.mean(axis=1) if data.ndim > 1 else data
    except ImportError:
        digest = hashlib.sha256(payload).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        return (rng.rand(1024).astype(np.float32) * 2.0) - 1.0


IMAGE_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, mean_r double, mean_g double, "
    "mean_b double, brightness double, phash string"
)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image features via mapInPandas (decode → channel means +
    average-hash-style fingerprint). Input rows with kind != 'image' are
    filtered JVM-side before any byte crosses to Python."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_image(bytes(payload)).astype(np.float64)
                means = arr.reshape(-1, 3).mean(axis=0)
                gray = arr.mean(axis=2)
                bits = (gray > gray.mean()).flatten()
                phash = np.packbits(bits[:64]).tobytes().hex()
                rows.append(
                    (mid, len(payload), means[0], means[1], means[2],
                     float(gray.mean()), phash)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "mean_r", "mean_g",
                         "mean_b", "brightness", "phash"],
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(compute, IMAGE_FEATURES_SCHEMA)
    )


RESIZE_SCHEMA = "media_id string, width int, height int, pixels binary"


def resize_images(media: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Thumbnail stage: decode → nearest-neighbor resize → raw RGB bytes.
    (Nearest-neighbor is numpy-only, so the transform itself is real even
    while decode is stubbed.)"""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_image(bytes(payload))
                ys = (np.arange(height) * arr.shape[0] // height).clip(0, arr.shape[0] - 1)
                xs = (np.arange(width) * arr.shape[1] // width).clip(0, arr.shape[1] - 1)
                small = arr[np.ix_(ys, xs)]
                rows.append((mid, width, height, small.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "pixels"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(compute, RESIZE_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id string, n_samples long, rms double, zero_crossings long"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip RMS + zero-crossing count over decoded PCM."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                sr = int(meta["sample_rate"] or 16000) if meta is not None else 16000
                pcm = _decode_audio(bytes(payload), sr)
                zc = int(np.sum(np.abs(np.diff(np.signbit(pcm)))))
                rows.append((mid, len(pcm), float(np.sqrt((pcm**2).mean())), zc))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "zero_crossings"]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "meta")
        .mapInPandas(compute, AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plumbing*: one output row per kept frame
    index, JVM-side (sequence + explode — no Python). Pair with
    :func:`frame_features` to decode + featurize the kept frames."""
    frames = (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.coalesce(F.col("meta.n_frames"), F.lit(0)).alias("n_frames"),
        )
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                                 F.lit(every_n))),
        )
        .select("media_id", "frame_idx")
    )
    return frames


def decode_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Decode one video frame to an HxWx3 uint8 array.

    Real path: PyAV (unavailable here — same try/except activation gate
    as ``_decode_image``/``_decode_audio``: dropping ``av`` onto a real
    cluster activates true decoding without touching any caller).
    Deterministic fake: an 8×8×3 array seeded from (payload, frame_idx)
    so downstream per-frame features are distinct per frame and stable
    across runs/partitions."""
    try:  # pragma: no cover - PyAV not in this container
        import io

        import av  # type: ignore

        with av.open(io.BytesIO(payload)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i == frame_idx:
                    return frame.to_ndarray(format="rgb24")
        raise IndexError(f"frame {frame_idx} out of range")
    except ImportError:
        digest = hashlib.sha256(
            payload + int(frame_idx).to_bytes(8, "big")
        ).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


FRAME_FEATURES_SCHEMA = (
    "media_id string, frame_idx int, brightness double, phash string"
)


def frame_features(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Per-sampled-frame features: explode kept frame indices JVM-side
    (same sequence/explode as :func:`sample_frames`), then decode +
    featurize each kept frame in one Arrow-batched ``mapInPandas``.

    Scale note: the encoded payload is shipped once per KEPT frame
    through the explode — fine while ``every_n`` keeps frames sparse;
    for dense sampling of long videos group by media_id inside the UDF
    instead (one decode pass per video) and explode in Python.
    """

    frames = (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.coalesce(F.col("meta.n_frames"), F.lit(0)).alias("n_frames"),
        )
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("media_id", "payload", "frame_idx")
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, idx in zip(
                pdf["media_id"], pdf["payload"], pdf["frame_idx"]
            ):
                arr = decode_frame(bytes(payload), int(idx)).astype(np.float64)
                gray = arr.mean(axis=2)
                bits = (gray > gray.mean()).flatten()
                phash = np.packbits(bits[:64]).tobytes().hex()
                rows.append((mid, int(idx), float(gray.mean()), phash))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "brightness", "phash"]
            )

    return frames.mapInPandas(compute, FRAME_FEATURES_SCHEMA)

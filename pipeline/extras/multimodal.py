"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, partition-sized Arrow batches,
``mapInPandas`` signatures, deterministic synthesis — is real and tested.
The actual media decode (PIL/ffmpeg/torchaudio) is NOT available in this
container, so the decode kernel is stubbed behind ``_decode_image``: it
either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake feature vector derived from the bytes (test mode).
Swapping in a real decoder changes ONE function; the distributed plan is
unchanged.

Schema convention:

  media(doc_id STRING, kind STRING, payload BINARY,
        meta STRUCT<width INT, height INT, format STRING, duration_ms INT>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        payload = (h * 64)[: 1024 + (i % 7) * 128]
        rows.append(
            (
                f"doc{i:05d}",
                kind,
                bytearray(payload),
                (64 + i % 512, 64 + (i * 7) % 512, "fake", 1000 + i),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


try:  # import-gated real decoder: used automatically when PIL exists
    from PIL import Image as _PILImage
except ImportError:  # not installed in this sandbox (documented)
    _PILImage = None


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in features: FEATURE_DIM floats from a sha256
    of the payload — stable across runs/executors/environments."""
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * ((4 * FEATURE_DIM) // len(h) + 1))[: 4 * FEATURE_DIM],
                        dtype=np.uint32)
    return (arr % 1000).astype(np.float32) / 1000.0


def _decode_image(payload: bytes, strict: bool = False) -> np.ndarray:
    """Image decode kernel. With PIL installed (production), decodes the
    payload, resizes to 4x4 grayscale and returns the 16 pixel
    intensities in [0,1] — a real, deterministic thumbnail feature.
    UNDECODABLE payloads (truncated/corrupt/non-image bytes — a mapInPandas
    batch must never die on one bad row) fall back to the deterministic
    sha256 fake, or raise ValueError in strict mode. That fallback also
    means synthetic (non-image) corpora produce the SAME features whether
    or not PIL happens to be importable. Without PIL (this sandbox) every
    payload takes the fake path; strict mode raises NotImplementedError
    loudly instead. The Spark-side plumbing (schema, mapInPandas batching,
    partitioning) is identical on every path."""
    if _PILImage is not None:
        import io

        side = int(FEATURE_DIM**0.5)
        try:
            img = (
                _PILImage.open(io.BytesIO(payload))
                .convert("L")
                .resize((side, side))
            )
        except Exception as e:
            if strict:
                raise ValueError(
                    f"undecodable image payload ({len(payload)} bytes): {e}"
                ) from e
            return _fake_features(payload)
        return (
            np.asarray(img, dtype=np.float32).reshape(FEATURE_DIM) / 255.0
        )
    if strict:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg — not installed in this "
            "environment; the import-try above wires the real decoder "
            "in automatically where PIL exists"
        )
    return _fake_features(payload)


FEATURES_SCHEMA = (
    "doc_id string, kind string, n_bytes long, features array<float>"
)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch of binary payloads
    in, one batch of float vectors out. The UDF body is the only place
    that touches bytes; everything else is columnar."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                _decode_image(bytes(p)).tolist() for p in b["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "kind": b["kind"],
                    "n_bytes": [len(bytes(p)) for p in b["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into frame
    timestamps (JVM sequence — no decode); a downstream mapInPandas decode
    (stubbed, as above) would fetch pixels per (doc_id, frame_ts)."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )

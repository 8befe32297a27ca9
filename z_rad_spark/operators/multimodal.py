"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride along as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The container ships no codec
libraries, so the decode step is STUBBED: ``decode_stub='deterministic'``
produces a seed-stable fake feature vector from the payload bytes (real
plumbing — schema, batching, partitioning — is exercised and tested);
``decode_stub='raise'`` marks the integration point with
NotImplementedError for production codecs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (binary payloads from a seeded RNG)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 256)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(16, 512)) if kind == "image" else None,
                16000 if kind == "audio" else None,
                int(rng.integers(1, 300)) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes) -> list[float]:
    """Seed-stable stand-in for a real decoder: FEATURE_DIM floats derived
    from the sha256 of the payload (so tests are deterministic and the
    Arrow plumbing is identical to a real extractor's)."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_features(media: DataFrame, decode_stub: str = "deterministic") -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    Real decoders (PIL/librosa/ffmpeg) plug in at the marked point; batch
    shape, output schema, and partitioning are production-real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                elif decode_stub == "deterministic":
                    feats.append(_fake_features(bytes(payload)))
                else:
                    # integration point for real codecs
                    raise NotImplementedError(
                        "media decode requires codec libraries not present "
                        "in this environment"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: explode sampled frame indices JVM-side;
    the (stubbed) per-frame decode then rides the same mapInPandas path."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition strategy, Arrow batch shape,
UDF signatures) is real and tested; the actual codec work is STUBBED —
image/audio libraries are not in this container. ``fake=True`` swaps in a
deterministic stand-in decoder so the distributed plumbing can be exercised
end to end; ``fake=False`` raises NotImplementedError where PIL/ffmpeg
would be called.

Batch shape contract: mapInPandas receives column-pruned Arrow batches —
binary payloads stream batch-by-batch, never materialized per partition,
so executor memory is bounded by (arrow batch rows × max payload size).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, mean_byte double, feature array<float>"
)


def synthetic_media_df(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake corpus: payload = seeded pseudo-random bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [
                (np.arange(64, dtype=np.uint64) * np.uint64(i * 2654435761 + 12345))
                .astype(np.uint8)
                .tobytes()
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "mime": ["image/fake"] * len(ids),
                    "meta": [
                        {"width": 8, "height": 8, "duration_ms": int(i) % 5000 + 1000, "codec": "raw"}
                        for i in ids
                    ],
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def decode_and_featurize(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payload → fixed-length feature vector, batch-vectorized.
    Real decode (PIL.Image.open / librosa) is stubbed behind ``fake``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa; "
                    "not available in this environment"
                )
            feats, means, sizes = [], [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                sizes.append(len(arr))
                means.append(float(arr.mean()) if len(arr) else 0.0)
                # deterministic fake "embedding": first 16 bytes scaled
                v = np.zeros(16, dtype=np.float32)
                v[: min(16, len(arr))] = arr[:16].astype(np.float32) / 255.0
                feats.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "mean_byte": means,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame offset.
    Offsets derive from metadata (duration), payload decode is stubbed."""
    frames = F.when(
        F.col("meta.duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0)))
    return df.select(
        "media_id", F.explode(frames).alias("frame_ms"), "mime"
    )

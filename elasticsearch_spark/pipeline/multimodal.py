"""Multimodal columns: opaque binary payloads + typed metadata.

The 100-TB layout: media ride along as `binary` columns with a typed metadata
struct; decode / feature-extraction runs as Arrow-batched mapInPandas so
executors stream record batches without materializing whole partitions. The
actual codec (PIL/ffmpeg) is NOT in this container, so the decode kernel is
STUBBED: `decode_stub=True` produces deterministic fake features (seeded by
content hash), `decode_stub=False` raises NotImplementedError where the real
library call belongs. Everything around the stub — schema, batch iteration,
partition-preserving plumbing, column pruning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, format:string, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, "
    "feat array<float>, thumb_w int, thumb_h int"
)


def synth_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded pseudo-bytes)."""
    df = spark.range(0, n, 1, partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.unhex(F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256))
    meta = F.struct(
        (F.col("id") % 16 * 64 + 64).cast("int").alias("width"),
        (F.col("id") % 9 * 64 + 64).cast("int").alias("height"),
        F.element_at(
            F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")), (F.col("id") % 3 + 1).cast("int")
        ).alias("format"),
        (F.col("id") * 40 + 1000).cast("int").alias("duration_ms"),
    )
    return df.select(
        F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def extract_features(
    media: DataFrame, feat_dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + featurize each payload in Arrow batches.

    Real deployment: replace the stub branch with PIL.Image.open /
    soundfile.read / cv2.VideoCapture over `payload` bytes. The stub derives
    a deterministic feat vector from the payload bytes so downstream
    pipelines (dedup-by-feature, ANN) are exercisable end-to-end.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode needs PIL/soundfile/ffmpeg — not in container"
                )
            n = len(pdf)
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                # deterministic fake embedding: folded byte histogram
                f = np.resize(b, feat_dim) / 255.0
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feat": feats,
                    "thumb_w": [min(int(m["width"]), 128) for m in pdf["meta"]],
                    "thumb_h": [min(int(m["height"]), 128) for m in pdf["meta"]],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling plan: one row per sampled timestamp (the decode of
    the actual frame is the same stubbed kernel). Pure column math — the
    explode happens BEFORE decode so Spark parallelizes across frames."""
    vids = media.where(F.col("kind") == "video")
    stamps = F.sequence(
        F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
    )
    return vids.select(
        "media_id", F.explode(stamps).alias("frame_ms"), "payload", "meta"
    )

"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` payload column plus typed
metadata (kind, width/height/duration, codec) -- the lakehouse-standard
layout for multimodal training data.  Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched Pandas UDFs via
``mapInPandas``: batches of payload bytes cross to Python once, columnar,
never row-at-a-time.

The actual decoders (PIL / torchaudio / ffmpeg) are NOT installed in
this container, so the decode kernel is STUBBED: `decode_media` raises
NotImplementedError where a real decoder would run, and
`extract_features` substitutes a deterministic fake (crc32-seeded
vector) so the Spark-side plumbing -- schema, batching, partitioning,
UDF signature -- is real and testable end-to-end.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "RESIZE_SCHEMA",
    "synth_media",
    "decode_media",
    "extract_features",
    "sample_frames",
    "resize_media",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 8
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = sha2-derived bytes)
    for exercising the plumbing without real codecs."""
    kinds = ["image", "audio", "video"]
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in kinds]), (F.col("id") % 3 + 1).cast("int")).alias(
            "kind"
        ),
        F.unhex(F.sha2(F.col("id").cast("string"), 256)).alias("payload"),
        F.create_map(
            F.lit("frames"), ((F.col("id") % 7) + 1).cast("string"),
            F.lit("codec"), F.lit("synthetic"),
        ).alias("meta"),
    )
    return df


def decode_media(payload: bytes, kind: str):
    """The real decode kernel would live here (PIL.Image.open /
    soundfile.read / av.open).  Decoders are not available in this
    environment."""
    raise NotImplementedError(
        f"no decoder available for kind={kind!r}: install pillow/soundfile/av "
        "and replace this stub; the surrounding Spark plumbing is complete."
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic decode stand-in: crc32 of (payload || j), scaled to
    [0, 1).  Replace with a real embedding model at deployment."""
    return [
        zlib.crc32(payload + bytes([j])) / 2**32 for j in range(dim)
    ]


def extract_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each Python worker receives columnar batches; the loop
    below is per-batch, and only the decode kernel itself is per-item
    (unavoidable for codec work).  Output schema is fixed and typed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if use_stub:
                    feats.append(_fake_feature(raw))
                else:  # pragma: no cover - needs real codecs
                    feats.append(decode_media(raw, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, width: int = 64, height: int = 64, use_stub: bool = True
) -> DataFrame:
    """Resize pass for image rows: Arrow-batched mapInPandas, binary in /
    binary out, target dims carried as typed metadata columns.

    The decode->resample->re-encode kernel is stubbed (no PIL in this
    container): the stand-in is a deterministic digest of
    (payload || WxH), so the plumbing -- filter pushdown to the scan,
    batch shape, fixed output schema, per-item kernel call -- is the real
    production shape and fully testable.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if use_stub:
                    out.append(
                        hashlib.sha256(raw + f"|{width}x{height}".encode()).digest()
                    )
                else:  # pragma: no cover - needs real codecs
                    out.append(decode_media(raw, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video rows: explode meta['frames'] into one row
    per sampled frame index (0, every_n, 2*every_n, ...).

    Pure Catalyst (sequence + explode) -- the frame EXTRACTION would be a
    decode-kernel call per sampled frame; indexes and row shape are the
    real plumbing.
    """
    frames = F.element_at(F.col("meta"), F.lit("frames")).try_cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), frames - 1, F.lit(every_n))),
        )
        .select("media_id", "frame_idx", "payload")
    )

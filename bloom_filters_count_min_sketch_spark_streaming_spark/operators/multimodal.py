"""Multimodal (binary payload) column operators (SURVEY §2.D D5).

Design: image/audio/video payloads are opaque ``binary`` columns plus a
typed metadata struct, processed with Arrow-batched ``mapInPandas`` — the
schema, partition sizing, and UDF batch shape are the real, tested part.
The codec step itself (PIL/librosa/ffmpeg) is NOT available in this
environment, so ``decode_image`` is stubbed: it either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
feature vector derived from the bytes (test mode). Swapping in a real
decoder changes only the body of ``_decode_batch``.

At 100 TB: payloads dominate row size -> keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so tasks hold a
handful of payloads, and always select() metadata-only columns before
wide shuffles (column pruning keeps payload bytes out of the exchange).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", StructType([])),  # replaced below
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from a text fixture: payload =
    utf-8 bytes (stand-in for image bytes), metadata struct alongside."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
            F.lit(64).alias("feat_dim"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image decode + feature extraction:
    byte-histogram moments. Replace with a real codec in production."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [round(a / n, 4) for a in acc]


def decode_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas decode: binary payload -> feature vector.

    Arrow-batched; one Python worker pass per partition. ``strict=True``
    raises NotImplementedError exactly where a real codec would plug in.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires codec libs not present "
                    "in this environment; use strict=False for the "
                    "deterministic fake-feature path"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "features": pdf["payload"].map(_fake_decode),
                }
            )
            yield out

    return df.mapInPandas(_decode_batch, FEATURE_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Reference parity: the `datalink` type (pkg/container/types/types.go:87 —
URL-pointer to external blob, read by load_file / load_file_chunks TVF
table_function/load_file_chunks.go) and blob columns (types.go:85). For
LLM-data pipelines: image/audio/video travel as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over mapInPandas.

The actual codecs (PIL/ffmpeg/...) are NOT in this container — decode is
STUBBED behind NotImplementedError with a deterministic fake
(`fake_decoder`), while everything Spark-side is real and tested: schema,
binary encoding, batch iteration shape, partition-preserving mapInPandas,
metadata projection.

Scale: mapInPandas streams Arrow batches — constant memory per task; binary
payloads never pass through Python row-at-a-time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("digest", StringType()),
        StructField("media_type", StringType()),
    ]
)


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table: binary payload (utf-8 of text — deterministic
    stand-in for image bytes) + typed metadata derived from the id."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        ((F.col(id_col) % 16 + 1) * 64).cast("int").alias("width"),
        ((F.col(id_col) % 9 + 1) * 64).cast("int").alias("height"),
    )


def real_decoder(payload: bytes, media_type: str):
    """Where PIL/librosa/ffmpeg decode would run. The container ships no
    codec libraries, so this is an explicit stub (SURVEY north-star note)."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; use fake_decoder for the pipeline plumbing"
    )


def fake_decoder(payload: bytes, media_type: str) -> "tuple[int, str]":
    """Deterministic decode stand-in: (byte length, md5 digest)."""
    return len(payload), hashlib.md5(payload).hexdigest()


def extract_features(media: DataFrame, decoder=fake_decoder) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow batches;
    the real pipeline would emit embeddings/frames here)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes, digest = [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                n, d = decoder(bytes(payload), mt)
                n_bytes.append(n)
                digest.append(d)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "digest": digest,
                    "media_type": pdf["media_type"],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Reference parity: the `datalink` type (pkg/container/types/types.go:87 —
URL-pointer to external blob, read by load_file / load_file_chunks TVF
table_function/load_file_chunks.go) and blob columns (types.go:85). For
LLM-data pipelines: image/audio/video travel as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over mapInPandas.

Decode paths, tiered by what the environment provides:
- `decode_image_meta` — REAL header decode (PNG IHDR / GIF / BMP / JPEG SOF
  marker walk) in pure stdlib: actual bytes parsed per the container format
  specs, no codec wheel needed. `png_bytes` synthesizes real zlib-compressed
  PNGs so the path is exercised end-to-end in-container
  (tests/test_multimodal.py + the multimodal_png_decode driver query).
- `real_decoder` — full pixel decode via PIL when importable; falls back to
  the header parser for image types; NotImplementedError only for payloads
  that genuinely need codec libraries (audio/video frames).
- `fake_decoder` — deterministic stand-in for oracle-gated plumbing tests.

Everything Spark-side is real in all tiers: schema, binary encoding, batch
iteration shape, partition-preserving mapInPandas, metadata projection.

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


def png_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """Synthesize a REAL (spec-valid, zlib-compressed) 8-bit RGB PNG of the
    given dimensions — pure stdlib, so the real decode path is exercisable
    in-container. Deterministic in (width, height, seed)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    px = bytes((seed + x + y) % 256 for y in range(height) for x in range(3 * width))
    raw = b"".join(
        b"\x00" + px[y * 3 * width : (y + 1) * 3 * width] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image_meta(payload: bytes) -> "tuple[int, int, str] | None":
    """REAL header decode: (width, height, format) parsed from the actual
    bytes per format spec — PNG IHDR, GIF logical screen, BMP info header,
    JPEG SOF marker walk. None if the payload matches no known magic."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h, "png"
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "gif"
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return w, abs(h), "bmp"
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h, "jpeg"
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def real_decoder(payload: bytes, media_type: str):
    """Full pixel decode via PIL when importable; real header decode for
    image payloads otherwise; explicit NotImplementedError only for media
    that genuinely needs codec libraries (audio/video)."""
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, img.format.lower() if img.format else "unknown"
    except ImportError:
        meta = decode_image_meta(payload)
        if meta is not None:
            return meta
        raise NotImplementedError(
            f"decoding {media_type!r} payloads requires codec libraries not "
            "present in this environment (header magics matched no image "
            "format); use fake_decoder for plumbing tests"
        )


def fake_decoder(payload: bytes, media_type: str) -> "tuple[int, str]":
    """Deterministic decode stand-in: (byte length, md5 digest)."""
    return len(payload), hashlib.md5(payload).hexdigest()


PNG_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

PNG_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def attach_png_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL PNG payload per row (dims derived from the id so an
    oracle can recompute them) — Arrow-batched mapInPandas, constant memory
    per task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        png_bytes(int(i) % 16 + 1, int(i) % 9 + 1, seed=int(i))
                        for i in ids
                    ],
                }
            )

    return docs.mapInPandas(batches, PNG_MEDIA_SCHEMA)


def decode_png_media(media: DataFrame) -> DataFrame:
    """Recover image metadata by PARSING the payload bytes (real_decoder:
    PIL if importable, else the stdlib header decode)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w, h, fmts = [], [], []
            for payload in pdf["payload"]:
                ww, hh, fmt = real_decoder(bytes(payload), "image/png")
                w.append(ww)
                h.append(hh)
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "fmt": fmts,
                }
            )

    return media.mapInPandas(batches, PNG_META_SCHEMA)


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

"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a `binary`
column (or a reference into object storage when > ~1 MB), metadata is a
typed struct, and every decode / feature-extract / resize / frame-sample
step is an Arrow-batched `mapInPandas` operator so payload bytes move
once per stage, in columnar batches, never row-at-a-time.

The container ships no image/audio libs, so the decode kernels are
STUBS: `fake=True` produces deterministic synthetic outputs (content-
hash-seeded) with the real schema, partitioning, UDF signature and
batch shape — everything except the pixel math is production-shaped;
with fake=False they raise NotImplementedError at the decode site.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# typed metadata struct carried alongside every payload
META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)

IMAGE_FEATURES_SCHEMA = "doc_id long, media_type string, feat array<float>, n_bytes long"
RESIZE_SCHEMA = "doc_id long, media_type string, payload binary, width int, height int"


def with_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach the typed metadata struct (parsed from a real container
    header in production; here: deterministic from content bytes)."""
    h = F.xxhash64(F.col(payload_col))
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.pmod(h, F.lit(1920)) + 32).cast("int").alias("width"),
            (F.pmod(h, F.lit(1080)) + 32).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a CNN/CLIP embedding: bytes of
    sha256(payload) cycled into [0,1) floats."""
    d = hashlib.sha256(payload).digest()
    return [d[i % len(d)] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
    fake: bool = True,
) -> DataFrame:
    """Decode + feature-extract operator (mapInPandas). Arrow moves the
    binary column in batches; output is id + feature vector — the
    payload is dropped exiting this stage so downstream shuffles carry
    vectors, not media bytes (the single most important property of a
    multimodal pipeline at scale)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg — not in this container"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image/fake",
                    "feat": [_fake_feature(bytes(p), dim) for p in pdf[payload_col]],
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Resize operator stub: production would decode→resize→re-encode
    per batch; the fake truncates/pads bytes deterministically to prove
    the binary-in/binary-out plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64 + 8
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires an image lib")
            payloads = [
                (bytes(p) * (target // max(len(bytes(p)), 1) + 1))[:target]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image/fake",
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame
    (explode-shaped mapInPandas — row count grows, which is why this
    runs BEFORE feature extraction and AFTER any filtering)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            ids, frames, blobs = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                n_frames = max(len(b) // 32, 1)
                for f_idx in range(0, n_frames, every_n):
                    ids.append(i)
                    frames.append(f_idx)
                    blobs.append(b[f_idx * 32 : (f_idx + 1) * 32])
            yield pd.DataFrame(
                {"doc_id": ids, "frame": frames, "payload": blobs}
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, "doc_id long, frame int, payload binary"
    )

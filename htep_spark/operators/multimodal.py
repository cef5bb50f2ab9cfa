"""Multimodal column plumbing: binary payloads + typed metadata.

Task-brief operators for image/audio/video columns: the media are opaque
``binary`` columns; decode / feature-extract / resize / frame-sample run as
Arrow-vectorized ``mapInPandas`` stages. The image/audio codec libraries are
not available in this container, so the *decode kernel* is stubbed — either
a clearly-marked ``NotImplementedError`` (``strict=True``) or a
deterministic fake decoder (default) — while everything Spark-side is real
and tested: schema, batch shape, partitioning, UDF signatures.

The deterministic fake "decoder" derives width/height/n_frames/duration
from a stable hash of the payload bytes, so tests pin exact outputs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_FEATURES_SCHEMA",
    "decode_media",
    "make_media_table",
    "resize_media",
    "sample_frames",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("error", StringType(), True),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the real codec (STUB — see module doc)."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 120
    duration = 0.0 if kind == "image" else round(n_frames / 24.0, 6)
    feature = [round(b / 255.0, 6) for b in h[:8]]
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_sec": duration,
        "feature": feature,
    }


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """media table → per-item decoded metadata + feature vector.

    ``mapInPandas`` keeps the whole Arrow batch in one Python call (the
    batched-inference pattern of ``src/recognition/icr_block_engine.py:162-195``);
    per-item failures land in the ``error`` column (stage isolation), never
    fail the job.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for _, r in batch.iterrows():
                payload = r["payload"]
                base = {
                    "media_id": r["media_id"],
                    "kind": r["kind"],
                    "n_bytes": len(payload) if payload is not None else 0,
                    "width": None,
                    "height": None,
                    "n_frames": None,
                    "duration_sec": None,
                    "feature": None,
                    "error": None,
                }
                try:
                    if strict:
                        raise NotImplementedError(
                            "real media codecs unavailable in this environment"
                        )
                    base.update(_fake_decode(payload, r["kind"]))
                except Exception as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA])

    return df.select("media_id", "kind", "payload").mapInPandas(
        decode, schema=MEDIA_FEATURES_SCHEMA
    )


def make_media_table(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4)
        rows.append((f"m-{i:04d}", kind, bytearray(payload), f"{kind}/x-fake"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("target_w", IntegerType(), True),
        StructField("target_h", IntegerType(), True),
        StructField("payload", BinaryType(), True),
        StructField("error", StringType(), True),
    ]
)


def resize_media(df: DataFrame, width: int, height: int, strict: bool = False) -> DataFrame:
    """Resize stage (STUB codec, real plumbing): emits a deterministic
    fake-resized payload (sha256 of payload+dims, truncated proportionally
    to the pixel count) with the target dimensions recorded. The Spark
    shape — binary in, binary out via ``mapInPandas``, per-item error
    isolation — is exactly what a real codec kernel drops into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for _, r in batch.iterrows():
                base = {
                    "media_id": r["media_id"],
                    "kind": r["kind"],
                    "target_w": width,
                    "target_h": height,
                    "payload": None,
                    "error": None,
                }
                try:
                    if strict:
                        raise NotImplementedError("no image codec in container")
                    seed = hashlib.sha256(
                        bytes(r["payload"] or b"") + f"{width}x{height}".encode()
                    ).digest()
                    reps = max(1, (width * height) // (64 * 256))
                    base["payload"] = bytearray(seed * reps)
                except Exception as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 24, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage for video payloads (STUB decode): emits one row
    per sampled frame index (deterministic stride over the fake-decoded
    frame count) — a flatMap-shaped ``mapInPandas`` (1 → N rows), the same
    batch shape a real ffmpeg-backed sampler would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for _, r in batch.iterrows():
                if r["kind"] != "video":
                    continue
                meta = _fake_decode(r["payload"], r["kind"])
                for j, idx in enumerate(range(0, meta["n_frames"], every_n)):
                    if j >= max_frames:
                        break
                    frame = hashlib.sha256(
                        bytes(r["payload"] or b"") + idx.to_bytes(4, "big")
                    ).digest()
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": idx,
                            "frame_payload": bytearray(frame),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )

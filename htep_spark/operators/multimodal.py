"""Multimodal column plumbing: binary payloads + typed metadata.

Task-brief operators for image/audio/video columns: media are opaque
``binary`` columns; decode / feature-extract / resize / frame-sample run as
Arrow-vectorized ``mapInPandas`` stages (whole batch per Python call, the
batched-inference pattern of ``src/recognition/icr_block_engine.py:162-195``;
per-item failures land in an ``error`` column and never fail the job).

Decode kernels are REAL pure-Python codecs (``functions/codecs.py``): PNG
(stdlib zlib), JPEG incl. progressive (``functions/jpeg.py``), BMP, PPM,
TIFF (none/PackBits, II/MM), PCM WAV
(stdlib wave), and the RAWV length-prefixed frame container for video.
Formats that would need external demuxer libraries (MP4, …) are not
decodable in this container: by default
(``strict=True``) they error per-item (``NotImplementedError`` in the
``error`` column, metadata all-null) — **no code path invents media
metadata unless explicitly opted into** via ``strict=False``, which falls
back to ``_fake_decode``, a clearly-marked deterministic stand-in
(``format='fake'``) that derives metadata from a payload hash so the Spark
plumbing stays testable on arbitrary bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import codecs

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_FEATURES_SCHEMA",
    "AUDIO_FEATURES_SCHEMA",
    "decode_media",
    "make_media_table",
    "resize_media",
    "sample_frames",
    "audio_features",
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
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("error", StringType(), True),
    ]
)


def _image_feature(img: np.ndarray) -> list:
    """8-bin grayscale-intensity histogram (fractions, 6dp)."""
    gray = img.mean(axis=2) if img.ndim == 3 else img
    hist, _ = np.histogram(gray, bins=8, range=(0, 256))
    total = max(int(hist.sum()), 1)
    return [round(float(x) / total, 6) for x in hist]


def _audio_feature(samples: np.ndarray) -> list:
    """RMS energy over 8 equal windows, normalized to int16 full scale."""
    mono = samples.astype(np.float64).mean(axis=1)
    chunks = np.array_split(mono, 8)
    return [
        round(float(np.sqrt(np.mean(c * c)) / 32768.0), 6) if len(c) else 0.0
        for c in chunks
    ]


def _real_decode(payload: bytes, kind: str) -> dict:
    """Format-sniffed real decode → metadata dict. Raises on undecodable."""
    fmt = codecs.sniff_format(payload)
    if fmt in ("png", "jpeg", "bmp", "ppm", "tiff", "gif"):
        if fmt == "gif":
            # single decode_gif pass: frame 0 feeds the feature/dims and
            # len() is the frame count (decode_image would LZW-decode the
            # whole animation a second time just to return frame 0)
            frames = codecs.decode_gif(payload)
            img, n_frames = frames[0], len(frames)
        elif fmt == "tiff":
            # multi-page TIFF: n_frames = pages of the next-IFD chain
            pages = codecs.decode_tiff_pages(payload)
            img, n_frames = pages[0], len(pages)
        elif fmt == "png":
            # APNG-aware: a still PNG is a 1-frame list, an acTL
            # animation composites its dispose/blend sequence
            frames = codecs.decode_png_frames(payload)
            img, n_frames = frames[0], len(frames)
        else:
            img, n_frames = codecs.decode_image(payload), 1
        return {
            "format": fmt,
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "n_frames": n_frames,
            "duration_sec": 0.0,
            "feature": _image_feature(img),
        }
    if fmt == "wav":
        samples, rate = codecs.decode_wav(payload)
        return {
            "format": fmt,
            "width": None,
            "height": None,
            "n_frames": int(samples.shape[0]),
            "duration_sec": round(samples.shape[0] / rate, 6),
            "feature": _audio_feature(samples),
        }
    if fmt == "rawv":
        n = codecs.rawv_frame_count(payload)
        first = codecs.decode_rawv(payload, frame_indices=[0])
        f0 = first[0] if first else None
        return {
            "format": fmt,
            "width": int(f0.shape[1]) if f0 is not None else None,
            "height": int(f0.shape[0]) if f0 is not None else None,
            "n_frames": n,
            "duration_sec": round(n / codecs.RAWV_FPS, 6),
            "feature": _image_feature(f0) if f0 is not None else None,
        }
    raise NotImplementedError(
        f"no codec for payload format '{fmt}' in this environment"
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for undecodable formats (STUB — module doc)."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 120
    duration = 0.0 if kind == "image" else round(n_frames / 24.0, 6)
    feature = [round(b / 255.0, 6) for b in h[:8]]
    return {
        "format": "fake",
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_sec": duration,
        "feature": feature,
    }


def decode_media(df: DataFrame, strict: bool = True) -> DataFrame:
    """media table → per-item decoded metadata + feature vector.

    Real codecs for PNG/JPEG/BMP/PPM/TIFF/WAV/RAWV payloads. Unknown formats raise
    per-item by default (``strict=True``): the row carries the error string
    and all-null metadata — never fabricated values. ``strict=False`` is an
    explicit opt-in to the deterministic fake decoder (``format='fake'``)
    for plumbing tests over arbitrary bytes.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, payload in zip(
                batch["media_id"].values, batch["kind"].values, batch["payload"].values
            ):
                base = {
                    "media_id": media_id,
                    "kind": kind,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "format": None,
                    "width": None,
                    "height": None,
                    "n_frames": None,
                    "duration_sec": None,
                    "feature": None,
                    "error": None,
                }
                try:
                    try:
                        base.update(_real_decode(bytes(payload or b""), kind))
                    except NotImplementedError:
                        if strict:
                            raise
                        base.update(_fake_decode(payload, kind))
                except Exception as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA])

    return df.select("media_id", "kind", "payload").mapInPandas(
        decode, schema=MEDIA_FEATURES_SCHEMA
    )


def _synth_image(i: int, w: int = 48, h: int = 32) -> np.ndarray:
    """Deterministic gradient-plus-stripe test pattern."""
    ys, xs = np.mgrid[0:h, 0:w]
    r = (xs * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (ys * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xs + ys + i * 17) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def make_media_table(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads: images cycle
    png/bmp/ppm/jpeg, audio is PCM WAV (440·(1+i%3) Hz sine), video is a
    RAWV container of shifted gradient frames."""
    rows = []
    kinds = ["image", "audio", "video"]
    img_fmts = ["png", "bmp", "ppm", "jpeg", "tiff"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            fmt = img_fmts[(i // 3) % 5]
            payload = codecs.encode_image(_synth_image(i), fmt)
            mime = f"image/{fmt}"
        elif kind == "audio":
            t = np.arange(8000 + (i % 3) * 4000)
            freq = 440.0 * (1 + i % 3)
            samples = (np.sin(2 * np.pi * freq * t / 16000.0) * 12000).astype(
                np.int16
            )
            payload = codecs.encode_wav(samples, rate=16000)
            mime = "audio/wav"
        else:
            frames = [_synth_image(i * 100 + j, w=32, h=24) for j in range(30 + i % 60)]
            payload = codecs.encode_rawv(frames)
            mime = "video/x-rawv"
        rows.append((f"m-{i:04d}", kind, bytearray(payload), mime))
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


def resize_media(
    df: DataFrame, width: int, height: int, strict: bool = True
) -> DataFrame:
    """Image resize stage: real nearest-neighbor resample, re-encoded in the
    source format (PNG/JPEG/BMP/PPM/TIFF). RAWV videos and animated GIFs
    resize every frame (GIF re-encodes via encode_gif_frames, so n_frames
    survives the round trip).
    Non-image
    payloads (WAV) and unknown formats error per-item by default
    (``strict=True``, null payload) — ``strict=False`` opts into a
    deterministic fake payload (STUB fallback for plumbing tests)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, raw in zip(
                batch["media_id"].values, batch["kind"].values, batch["payload"].values
            ):
                base = {
                    "media_id": media_id,
                    "kind": kind,
                    "target_w": width,
                    "target_h": height,
                    "payload": None,
                    "error": None,
                }
                payload = bytes(raw or b"")
                fmt = codecs.sniff_format(payload)
                try:
                    if fmt == "gif":
                        # resize EVERY frame and re-encode the animation —
                        # a multi-frame payload must not silently come back
                        # single-frame (ADVICE r04); nearest-neighbor keeps
                        # each (<=256-color) palette intact. Multi-palette
                        # animations whose COMPOSITED canvas states exceed
                        # 256 colors cannot be re-encoded faithfully (GIF's
                        # per-frame palette limit) — encode_gif_frames
                        # raises and the item surfaces as a per-item error
                        # row rather than a silently quantized or
                        # frame-dropped payload (review r05)
                        frames = [
                            codecs.resize_nearest(f, width, height)
                            for f in codecs.decode_gif(payload)
                        ]
                        base["payload"] = bytearray(
                            codecs.encode_gif_frames(frames)
                        )
                    elif fmt == "tiff":
                        # every page of the next-IFD chain resizes (same
                        # no-silent-collapse contract as animated GIF)
                        pages = [
                            codecs.resize_nearest(p, width, height)
                            for p in codecs.decode_tiff_pages(payload)
                        ]
                        base["payload"] = bytearray(
                            codecs.encode_tiff_pages(pages)
                        )
                    elif fmt == "png":
                        # APNG: every composited frame resizes and the
                        # animation re-encodes (full-canvas frames, blend
                        # source — the no-silent-collapse contract); a
                        # still PNG takes the single-image path unchanged
                        frames = [
                            codecs.resize_nearest(f, width, height)
                            for f in codecs.decode_png_frames(payload)
                        ]
                        base["payload"] = bytearray(
                            codecs.encode_png(frames[0])
                            if len(frames) == 1
                            else codecs.encode_apng(frames)
                        )
                    elif fmt in ("jpeg", "bmp", "ppm"):
                        img = codecs.decode_image(payload)
                        out = codecs.resize_nearest(img, width, height)
                        base["payload"] = bytearray(codecs.encode_image(out, fmt))
                    elif fmt == "rawv":
                        frames = [
                            codecs.resize_nearest(f, width, height)
                            for f in codecs.decode_rawv(payload)
                        ]
                        base["payload"] = bytearray(codecs.encode_rawv(frames))
                    elif strict:
                        raise NotImplementedError(
                            f"no resize codec for format '{fmt}'"
                        )
                    else:  # STUB fallback for undecodable payloads
                        seed = hashlib.sha256(
                            payload + f"{width}x{height}".encode()
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
        StructField("frame_idx", IntegerType(), True),
        StructField("frame_payload", BinaryType(), True),
        StructField("error", StringType(), True),
    ]
)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossing_rate", DoubleType(), True),
        StructField("spectral_centroid_hz", DoubleType(), True),
        StructField("spectral_bandwidth_hz", DoubleType(), True),
        StructField("spectral_rolloff_hz", DoubleType(), True),
        StructField("error", StringType(), True),
    ]
)


def _audio_spectral(samples: np.ndarray, rate: int) -> dict:
    """Deterministic global spectral features from the rFFT magnitude
    spectrum of the mono signal (numpy only — the real DSP math, not a
    stub): RMS (int16 full-scale), zero-crossing rate, magnitude-weighted
    spectral centroid/bandwidth, and the 85% energy rolloff frequency."""
    mono = samples.astype(np.float64).mean(axis=1) if samples.ndim == 2 else (
        samples.astype(np.float64)
    )
    n = mono.shape[0]
    rms = float(np.sqrt(np.mean(mono * mono)) / 32768.0) if n else 0.0
    zcr = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if n > 1
        else 0.0
    )
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = float(mag.sum())
    if total > 0.0:
        centroid = float((freqs * mag).sum() / total)
        bandwidth = float(
            np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total)
        )
        cum = np.cumsum(mag)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    else:
        centroid = bandwidth = rolloff = 0.0
    return {
        "rms": round(rms, 6),
        "zero_crossing_rate": round(zcr, 6),
        "spectral_centroid_hz": round(centroid, 3),
        "spectral_bandwidth_hz": round(bandwidth, 3),
        "spectral_rolloff_hz": round(rolloff, 3),
    }


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction stage: PCM WAV payloads → global spectral
    features (``_audio_spectral``). Arrow-batched ``mapInPandas`` like the
    other media stages; non-WAV audio rows carry the error column.

    Non-audio rows are filtered SPARK-SIDE before the Arrow transfer —
    this stage provably never uses them, so image/video payloads (the
    largest in a media table) must not ride through Python batches just
    to be dropped. The in-Python kind guard stays as a cheap invariant."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, raw in zip(
                batch["media_id"].values,
                batch["kind"].values,
                batch["payload"].values,
            ):
                if kind != "audio":
                    continue
                base = {
                    "media_id": media_id,
                    "sample_rate": None,
                    "n_samples": None,
                    "duration_sec": None,
                    "rms": None,
                    "zero_crossing_rate": None,
                    "spectral_centroid_hz": None,
                    "spectral_bandwidth_hz": None,
                    "spectral_rolloff_hz": None,
                    "error": None,
                }
                payload = bytes(raw or b"")
                try:
                    if codecs.sniff_format(payload) != "wav":
                        raise NotImplementedError(
                            "no audio codec for payload format "
                            f"'{codecs.sniff_format(payload)}'"
                        )
                    samples, rate = codecs.decode_wav(payload)
                    base.update(_audio_spectral(samples, rate))
                    base["sample_rate"] = int(rate)
                    base["n_samples"] = int(samples.shape[0])
                    base["duration_sec"] = round(samples.shape[0] / rate, 6)
                except Exception as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA]
            )

    import pyspark.sql.functions as SF

    return (
        df.filter(SF.col("kind") == "audio")
        .select("media_id", "kind", "payload")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(
    df: DataFrame, every_n: int = 24, max_frames: int = 8, strict: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: RAWV containers are really
    demuxed — only the strided frame indices are decoded (length-prefix
    seeking); animated GIFs decode their composited frame sequence and
    multi-page TIFFs their next-IFD page chain, with the strided indices
    emitted. Each sampled frame becomes a standalone PPM payload. A flatMap-shaped ``mapInPandas`` (1 → N rows).
    Undemuxable videos emit ONE row with null ``frame_idx``/
    ``frame_payload`` and the ``error`` set by default (``strict=True``)
    — like ``decode_media``/``resize_media``, an undecodable payload is
    visible, never silently dropped. ``strict=False`` opts into
    deterministic fake frames derived from the payload hash (STUB)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, raw in zip(
                batch["media_id"].values, batch["kind"].values, batch["payload"].values
            ):
                if kind != "video":
                    continue
                payload = bytes(raw or b"")
                fmt = codecs.sniff_format(payload)
                if fmt == "rawv":
                    try:  # corrupt containers → per-item error row, never
                        # a whole-task crash (same contract as the GIF
                        # branch / decode_media)
                        n = codecs.rawv_frame_count(payload)
                        idxs = list(range(0, n, every_n))[:max_frames]
                        frames = codecs.decode_rawv(payload, frame_indices=idxs)
                        for idx, frame in zip(idxs, frames):
                            rows.append(
                                {
                                    "media_id": media_id,
                                    "frame_idx": idx,
                                    "frame_payload": bytearray(
                                        codecs.encode_ppm(frame)
                                    ),
                                    "error": None,
                                }
                            )
                    # _strict_decoder translates corrupt-stream errors into
                    # ValueError; anything else is a programming bug and
                    # must fail the job (same contract as the GIF/TIFF
                    # branch below — ADVICE r05 / review r6)
                    except ValueError as exc:
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_idx": None,
                                "frame_payload": None,
                                "error": f"{type(exc).__name__}: {exc}",
                            }
                        )
                elif fmt in ("gif", "tiff", "png"):
                    # GIF: composited animation frames; TIFF: the pages of
                    # the next-IFD chain (TIFF 6.0 multi-image files);
                    # PNG: the APNG composited sequence (1 frame if still)
                    # — same strided sampling over the decoded sequence
                    try:
                        frames = (
                            codecs.decode_gif(payload)
                            if fmt == "gif"
                            else codecs.decode_tiff_pages(payload)
                            if fmt == "tiff"
                            else codecs.decode_png_frames(payload)
                        )
                        idxs = list(range(0, len(frames), every_n))[:max_frames]
                        for idx in idxs:
                            rows.append(
                                {
                                    "media_id": media_id,
                                    "frame_idx": idx,
                                    "frame_payload": bytearray(
                                        codecs.encode_ppm(frames[idx])
                                    ),
                                    "error": None,
                                }
                            )
                    # corrupt stream / IFD chain — _strict_decoder already
                    # translates struct/Index/EOF errors into ValueError, so
                    # anything else (TypeError, AttributeError, ...) is a
                    # programming bug and must fail the job (ADVICE r05)
                    except ValueError as exc:
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_idx": None,
                                "frame_payload": None,
                                "error": f"{type(exc).__name__}: {exc}",
                            }
                        )
                elif strict:  # visible per-item failure, never a silent drop
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": None,
                            "frame_payload": None,
                            "error": (
                                "NotImplementedError: no video demuxer for "
                                f"payload format '{fmt}' in this environment"
                            ),
                        }
                    )
                else:  # opt-in STUB fallback: hash-derived frames
                    meta = _fake_decode(raw, kind)
                    for j, idx in enumerate(range(0, meta["n_frames"], every_n)):
                        if j >= max_frames:
                            break
                        frame = hashlib.sha256(
                            payload + idx.to_bytes(4, "big")
                        ).digest()
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_idx": idx,
                                "frame_payload": bytearray(frame),
                                "error": None,
                            }
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("dhash", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash over image payloads — the standard
    near-duplicate signature for image corpora (dHash: downscale to 9x8
    integer luma, emit the 64 horizontal-gradient sign bits; Krawetz
    2013). Robust to re-encoding and mild brightness shifts because only
    gradient SIGNS survive into the hash — the property that lets one
    signature group a PNG master with its JPEG derivative. Arrow-batched
    ``mapInPandas`` (the decode is the unavoidable Python step); errors
    surface per item like every media stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, raw in zip(
                batch["media_id"].values,
                batch["kind"].values,
                batch["payload"].values,
            ):
                if kind != "image":
                    continue
                base = {
                    "media_id": media_id,
                    "dhash": None,
                    "width": None,
                    "height": None,
                    "error": None,
                }
                try:
                    img = codecs.decode_image(bytes(raw or b""))
                    if img.ndim == 2:
                        img = img[:, :, None]
                    h, w = img.shape[:2]
                    if img.shape[2] >= 3:
                        px = img[:, :, :3].astype(np.int64)
                        gray = (
                            px[:, :, 0] * 299
                            + px[:, :, 1] * 587
                            + px[:, :, 2] * 114
                        ) // 1000
                    else:
                        gray = img[:, :, 0].astype(np.int64)
                    small = codecs.resize_nearest(
                        gray.astype(np.uint8), 9, 8
                    ).astype(np.int64)
                    bits = (small[:, :-1] > small[:, 1:]).reshape(-1)
                    val = 0
                    for b in bits:
                        val = (val << 1) | int(b)
                    # two's-complement into a signed 64-bit long
                    if val >= 1 << 63:
                        val -= 1 << 64
                    base.update(
                        {"dhash": val, "width": int(w), "height": int(h)}
                    )
                except ValueError as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(
                rows, columns=[f.name for f in DHASH_SCHEMA.fields]
            )

    return df.filter(F.col("kind") == "image").mapInPandas(
        run, schema=DHASH_SCHEMA
    )


def media_near_dup(hashes: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Near-duplicate image pairs from `image_dhash` output — the
    simhash discipline verbatim: 8 bands of 8 bits; Hamming distance
    <= 7 guarantees (pigeonhole) at least one band matches exactly, so
    candidate generation is a band equi-join (never all-pairs) and the
    exact `bit_count(xor)` filter runs JVM-side on candidates only."""
    if max_hamming > 7:
        raise ValueError("8x8 banding only guarantees hamming <= 7")
    h = hashes.filter(F.col("dhash").isNotNull()).select("media_id", "dhash")
    bands = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("dhash"), 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("band_val"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("b"),
    ).select("media_id", "dhash", "b.band_idx", "b.band_val")
    left = bands.withColumnsRenamed({"media_id": "id_a", "dhash": "h_a"})
    right = bands.withColumnsRenamed({"media_id": "id_b", "dhash": "h_b"})
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("diff", DoubleType(), True),
        StructField("is_cut", IntegerType(), True),
        StructField("scene_id", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)


def scene_cuts(df: DataFrame, threshold: float = 12.0) -> DataFrame:
    """Shot-boundary detection over video payloads — the keyframe /
    scene-segmentation pass a video curation pipeline runs before
    frame-sampling (the classic mean-absolute-frame-difference detector;
    a cut opens a new scene when the per-pixel MAD against the previous
    frame exceeds ``threshold``). Accepts every multi-frame container
    the demux family handles (RAWV, animated GIF, multi-page TIFF,
    APNG); emits one row per frame with its difference score, cut flag
    and running scene id — so `sample_frames` callers can sample
    per-scene instead of blindly striding. Corrupt payloads surface as
    per-item error rows (the sample_frames contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, raw in zip(
                batch["media_id"].values,
                batch["kind"].values,
                batch["payload"].values,
            ):
                if kind != "video":
                    continue
                payload = bytes(raw or b"")
                fmt = codecs.sniff_format(payload)
                try:
                    if fmt == "rawv":
                        frames = codecs.decode_rawv(payload)
                    elif fmt == "gif":
                        frames = codecs.decode_gif(payload)
                    elif fmt == "tiff":
                        frames = codecs.decode_tiff_pages(payload)
                    elif fmt == "png":
                        frames = codecs.decode_png_frames(payload)
                    else:
                        raise ValueError(
                            f"no frame source for format '{fmt}'"
                        )
                    scene = 0
                    prev = None
                    for i, f in enumerate(frames):
                        if prev is None:
                            d, cut = 0.0, 0
                        else:
                            if f.shape != prev.shape:
                                raise ValueError(
                                    "frame geometry changed mid-stream"
                                )
                            d = float(
                                np.abs(
                                    f.astype(np.int16) - prev.astype(np.int16)
                                ).mean()
                            )
                            cut = 1 if d > threshold else 0
                            scene += cut
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_idx": i,
                                "diff": round(d, 6),
                                "is_cut": cut,
                                "scene_id": scene,
                                "error": None,
                            }
                        )
                        prev = f
                except ValueError as exc:
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": None,
                            "diff": None,
                            "is_cut": None,
                            "scene_id": None,
                            "error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_SCHEMA.fields]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(
        run, schema=SCENE_SCHEMA
    )

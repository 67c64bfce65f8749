"""Multimodal columns: image/audio/video as opaque binary with typed
metadata. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested; the actual codec calls are
STUBBED (image/audio libraries are not in this container) behind
``decode_fn`` hooks with a deterministic fake for tests.

Pattern: media bytes never enter a shuffle wider than necessary —
decode/feature-extract runs ``mapInPandas`` straight off the scan
(column pruning keeps `bytes` out of every other query), and only the
small derived features (dims, embedding) flow downstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_rag_spark.functions.hashing import fnv1a_64

MEDIA_SCHEMA = (
    "media_id long, kind string, url string, bytes binary, "
    "width int, height int, duration_ms int"
)

_FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def fake_decode(data: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real image/audio decode+featurize:
    hashes byte windows into a unit vector. Replace with a real codec
    via the decode_fn hook."""
    if not data:
        v = np.zeros(dim)
        v[0] = 1.0
        return v
    v = np.zeros(dim, dtype=np.float64)
    step = max(1, len(data) // 32)
    for i in range(0, len(data), step):
        h = fnv1a_64(data[i : i + step])
        v[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
    n = np.linalg.norm(v)
    if n == 0:
        v[0] = 1.0
        n = 1.0
    return v / n


def decode_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 16,
) -> DataFrame:
    """media(bytes,...) -> per-item feature vector via mapInPandas.

    A real decoder raises NotImplementedError unless provided; tests
    inject fake_decode. Batches stream (iterator form) so a partition
    of large blobs never materializes at once.
    """
    fn = decode_fn or _not_implemented_decode

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [float(x) for x in fn(b if b is not None else b"")]
                for b in pdf["bytes"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["bytes"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "bytes").mapInPandas(run, _FEATURE_SCHEMA)


def _not_implemented_decode(data: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in this "
        "environment; inject decode_fn (see fake_decode for the contract)"
    )


_RESIZE_SCHEMA = (
    "media_id long, width int, height int, target_w int, target_h int, "
    "scale_x double, scale_y double, bytes binary"
)


def fake_resize(data: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Deterministic stand-in for a real image resize: stride-samples
    the payload down to the target pixel ratio. Replace with a real
    codec via the resize_fn hook (same contract: bytes in, bytes out)."""
    if not data or not w or not h:
        return b""
    ratio = max(1e-9, min(1.0, (tw * th) / float(w * h)))
    keep = max(1, int(len(data) * ratio))
    step = max(1, len(data) // keep)
    return data[::step][:keep]


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resize_fn: Callable[[bytes, int, int, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize as a streamed mapInPandas over (media_id, bytes,
    width, height) — the third brief-mandated multimodal op alongside
    decode/feature-extract and frame-sample. The pixel work is the
    stubbed ``resize_fn`` (fake_resize for tests, NotImplementedError
    hook otherwise); the Spark plumbing is real: only image rows are
    scanned, the binary column never joins or shuffles (map-only plan
    straight off the scan), and batches stream via the iterator form so
    a partition of large blobs never materializes at once."""

    def _ni(data: bytes, w: int, h: int, tw: int, th: int) -> bytes:
        raise NotImplementedError(
            "real image resizing requires codec libraries not present in "
            "this environment; inject resize_fn (see fake_resize)"
        )

    fn = resize_fn or _ni

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes, sx, sy = [], [], []
            for b, w, h in zip(pdf["bytes"], pdf["width"], pdf["height"]):
                w = int(w) if pd.notna(w) else 0
                h = int(h) if pd.notna(h) else 0
                out_bytes.append(
                    bytearray(fn(bytes(b) if b is not None else b"", w, h, target_w, target_h))
                )
                sx.append(target_w / w if w else 0.0)
                sy.append(target_h / h if h else 0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "scale_x": sx,
                    "scale_y": sy,
                    "bytes": out_bytes,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "width", "height", "bytes")
        .mapInPandas(run, _RESIZE_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration_ms)
    into frame timestamps JVM-side (sequence+explode); the actual frame
    grab is the stubbed decode step. Keeps the expansion columnar so a
    2-hour video becomes 7200 plan rows without touching bytes."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=rng.randint(16, 256), dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                f"https://media.example/{kind}/{i}",
                bytearray(payload),
                rng.randint(16, 1920) if kind == "image" else None,
                rng.randint(16, 1080) if kind == "image" else None,
                int(rng.randint(1000, 60000)) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

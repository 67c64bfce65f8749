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

"""Stable 64-bit hashing shared by the embedder, minhash, simhash and
fingerprinting.

Uses FNV-1a (public-domain algorithm) so every component hashes
identically across driver, executors and test oracles — Python's
builtin ``hash`` is salted per-process and unusable here.
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1a_64(data: bytes, seed: int = 0) -> int:
    h = (FNV_OFFSET ^ (seed * FNV_PRIME)) & _MASK64
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & _MASK64
    return h


def fnv1a_64_str(s: str, seed: int = 0) -> int:
    return fnv1a_64(s.encode("utf-8"), seed)


def hash_family(values: list[str], n_hashes: int) -> np.ndarray:
    """n_hashes independent 64-bit hashes per value, shape (len, n_hashes).

    h_i(x) = (a_i * base(x) + b_i) mod 2^31-1 — a standard universal
    family over one strong base hash; vectorized in numpy. The prime
    is kept at 2^31-1 so a*base fits in uint64 without wraparound.
    """
    p = (1 << 31) - 1
    rng = np.random.RandomState(1234)
    a = rng.randint(1, p, size=n_hashes).astype(np.uint64)
    b = rng.randint(0, p, size=n_hashes).astype(np.uint64)
    base = np.array([fnv1a_64_str(v) for v in values], dtype=np.uint64) % p
    out = (base[:, None] * a[None, :] + b[None, :]) % p
    return out

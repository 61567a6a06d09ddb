"""Mergeable Bloom filter over a Dataset column.

Companion sketch to the HLL (functions/sketch.py): an approximate MEMBERSHIP
filter whose distributed build has constant-ish shuffle volume — each block
contributes one m-bit partial (bitwise-OR mergeable), and the merged filter
broadcasts through the object store to pre-filter a huge probe side before
an exact distributed join (stages/join.bloom_semi_join). No false negatives
ever (a true member always passes); false-positive probability is the
standard ``(1 - e^{-kn/m})^k``.

Public construction (Bloom 1970): k hash probes via double hashing
``h1 + i*h2`` (Kirsch-Mitzenmacher: two independent 64-bit halves of one
stable hash are enough), bits in a uint64 word array, vectorized
``np.bitwise_or.at`` scatter / gather-AND probe.
"""

from __future__ import annotations

import math

import numpy as np

from rp_extract_ray.stages.partition import stable_hash

_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for ``n_keys`` at target false-positive
    rate: m = -n ln p / ln2^2 (rounded up to a uint64 word), k = m/n ln2."""
    n_keys = max(n_keys, 1)
    m = int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, int(round(m / n_keys * math.log(2))))
    return m, min(k, 16)


def _probes(values, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, len(values)) array of bit indices, double-hashed."""
    h = stable_hash(np.asarray(values))
    h1 = h
    h2 = (h * _MIX2) ^ (h >> np.uint64(29))
    h2 |= np.uint64(1)  # odd => full-period stride
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def bloom_accumulate(
    values, n_bits: int, n_hashes: int, words: np.ndarray | None = None
) -> np.ndarray:
    """Fold values into a bit array (uint64 words). Vectorized scatter."""
    if words is None:
        words = np.zeros(n_bits // 64, dtype=np.uint64)
    idx = _probes(values, n_bits, n_hashes)
    np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
    return words


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Partial filters merge by bitwise OR (the sketch's mergeability)."""
    return np.bitwise_or(a, b)


def bloom_contains(values, words: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """Boolean membership mask; no false negatives."""
    idx = _probes(values, n_bits, n_hashes)
    bits = (words[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1)
    return (bits != 0).all(axis=0)

"""Deterministic hashing kernels: shingles, MinHash, SimHash, rolling hash.

Building blocks for the deduplication stages (stages/dedup.py). Everything is
seeded/constant — no process-dependent state — so results are identical
across workers, runs and cluster sizes. Vectorized with numpy over lists of
token arrays; per-batch cost is O(tokens)."""

from __future__ import annotations

import numpy as np

_M61 = np.uint64((1 << 61) - 1)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash64(tokens: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash of an array of (byte)strings via FNV-1a, vectorized
    per element (C loop in numpy via frombuffer is overkill; this is called
    on token vocabularies per batch)."""
    import zlib

    # crc32 of utf-8 bytes, widened and mixed — deterministic and fast
    out = np.fromiter(
        (zlib.crc32(t.encode() if isinstance(t, str) else t) for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )
    out = (out * _MIX) ^ (out >> np.uint64(17))
    return out


_FNV = np.uint64(0x100000001B3)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """k-gram shingle hashes of a string (uint64, deduplicated).

    Vectorized over the UTF-8 byte sequence with a sliding polynomial hash
    (stride tricks + one uint64 matmul-style reduction) — no per-shingle
    Python call. Shingles are byte-grams, which for near-dup purposes is
    equivalent to char-grams and ~100x faster to hash."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    if len(b) < k:
        h = (b.astype(np.uint64) * _FNV ** np.arange(len(b), dtype=np.uint64)).sum()
        h = (h ^ (h >> np.uint64(17))) * _MIX
        return np.array([h], dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(b, k).astype(np.uint64)
    weights = _FNV ** np.arange(k, dtype=np.uint64)  # wraps mod 2^64
    h = (w * weights[None, :]).sum(axis=1)
    h = (h ^ (h >> np.uint64(17))) * _MIX
    return np.unique(h)


def minhash_signature(
    shingle_hashes: np.ndarray, num_perm: int = 64, seed: int = 1
) -> np.ndarray:
    """num_perm-wide MinHash signature via the universal-hash family
    a*x+b mod p (p = 2^61-1). Empty input -> all-max signature."""
    if len(shingle_hashes) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    x = (shingle_hashes % _M61)[None, :]
    hv = (a[:, None] * x + b[:, None]) % _M61
    return hv.min(axis=1)


class MinHasher:
    """Precomputed permutation coefficients (build once per actor)."""

    def __init__(self, num_perm: int = 64, seed: int = 1, shingle_k: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingles(text, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = (sh % _M61)[None, :]
        return ((self.a[:, None] * x + self.b[:, None]) % _M61).min(axis=1)

    def signatures_batch(self, texts) -> np.ndarray:
        """(n, num_perm) signatures for a batch: shingles concatenated once,
        then ONE pass per permutation with ``np.minimum.reduceat`` over doc
        boundaries — the per-doc loop touches only strings, never hashes."""
        shingles = [char_shingles(t or "", self.shingle_k) for t in texts]
        counts = np.array([len(s) for s in shingles], dtype=np.int64)
        out = np.full((len(texts), self.num_perm), np.iinfo(np.uint64).max, np.uint64)
        nonempty = counts > 0
        if not nonempty.any():
            return out
        flat = np.concatenate([s for s in shingles if len(s)]) % _M61
        bounds = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]])
        sigs = np.empty((self.num_perm, int(nonempty.sum())), dtype=np.uint64)
        for j in range(self.num_perm):
            hv = (self.a[j] * flat + self.b[j]) % _M61
            sigs[j] = np.minimum.reduceat(hv, bounds)
        out[nonempty] = sigs.T
        return out


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of token hashes (optionally weighted)."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.float64
    )
    w = weights[:, None] if weights is not None else 1.0
    score = (bits * 2.0 - 1.0) * w
    agg = score.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if agg[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """Per-element Hamming distance of uint64 array vs scalar (vectorized
    via :func:`popcount64`)."""
    return popcount64(np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.uint64(b)))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def rolling_fingerprint(text: str, window: int = 16, keep: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: the ``keep`` smallest k-gram
    hashes (a deterministic content signature; reference analogue of the
    feature-vector id, SURVEY.md extension ops)."""
    sh = char_shingles(text, window)
    if len(sh) == 0:
        return np.zeros(keep, dtype=np.uint64)
    smallest = np.sort(sh)[:keep]
    if len(smallest) < keep:
        smallest = np.pad(smallest, (0, keep - len(smallest)), constant_values=0)
    return smallest


def tokens_hash_batch(token_lists: list) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 hashes, per-doc counts) for a batch of token arrays —
    ONE vectorized ``pd.util.hash_array`` over the concatenated tokens
    instead of a per-token Python loop (the round-1 crc32 fromiter)."""
    import pandas as pd

    counts = np.array([len(t) for t in token_lists], dtype=np.int64)
    if counts.sum() == 0:
        return np.empty(0, np.uint64), counts
    flat = np.concatenate([t for t in token_lists if len(t)])
    return pd.util.hash_array(flat.astype(object)), counts


def simhash64_batch(flat_hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-doc 64-bit SimHash from a flat token-hash array + doc counts.

    Vectorized: one (T, 64) bit expansion + ``np.add.reduceat`` over doc
    boundaries; a doc's bit j is set iff more than half its token hashes
    have bit j set (equivalent to the +-1 sum rule). Empty docs hash to 0.
    """
    n_docs = len(counts)
    out = np.zeros(n_docs, dtype=np.uint64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((flat_hashes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
    bounds = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]]).astype(np.int64)
    ones = np.add.reduceat(bits, bounds, axis=0)  # (docs_nonempty, 64)
    cnt = counts[nonempty][:, None]
    sig_bits = (2 * ones > cnt).astype(np.uint64)
    sigs = (sig_bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = sigs
    return out


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count of a uint64 array (byte-LUT; numpy<2 has
    no bitwise_count). Returns int32, same length."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if len(x) == 0:
        return np.empty(0, np.int32)
    return _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1).astype(np.int32)

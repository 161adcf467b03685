"""Sketch kernels for near-duplicate detection: shingling, MinHash,
SimHash, and n-gram Jaccard.

All hashes are seeded/deterministic across processes (no Python
``hash``), so sketches computed in different Ray workers agree — a hard
requirement for LSH bucketing via ``groupby``.
"""

from __future__ import annotations

from typing import List, Sequence, Set, Tuple

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def token_shingles(tokens: Sequence[str], k: int = 3) -> Set[str]:
    """k-token shingles of a token sequence (space-joined)."""
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _stable_hash32(values: List[str]) -> np.ndarray:
    """Deterministic 32-bit hashes of strings (FNV-1a, vectorizable)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = np.uint64(0xCBF29CE484222325)
        for b in v.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return (out & np.uint64(_MAX_HASH)).astype(np.uint64)


class MinHasher:
    """num_perm universal-hash MinHash over shingle sets.

    Permutations ``(a*x + b) mod p`` are derived from a fixed seed so
    every worker builds identical hash families (state created once per
    actor in ``__init__`` of the dedup stage).
    """

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )

    def signature(self, shingles: Set[str]) -> np.ndarray:
        """(num_perm,) uint64 minhash signature; empty set -> all MAX."""
        if not shingles:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint64)
        hv = _stable_hash32(sorted(shingles))  # (n,)
        # (num_perm, n): (a*x + b) mod p, then min over shingles
        prod = (self.a[:, None] * hv[None, :] + self.b[:, None]) % np.uint64(
            _MERSENNE
        )
        return (prod & np.uint64(_MAX_HASH)).min(axis=1)

    def bands(self, sig: np.ndarray, num_bands: int) -> List[Tuple[int, int]]:
        """LSH banding: (band_id, band_hash) keys for groupby bucketing."""
        rows = self.num_perm // num_bands
        out = []
        for band in range(num_bands):
            chunk = sig[band * rows : (band + 1) * rows]
            h = np.uint64(1469598103934665603)
            for v in chunk:
                h = np.uint64((int(h) ^ int(v)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            out.append((band, int(h & np.uint64((1 << 62) - 1))))
        return out


def jaccard(a: Set[str], b: Set[str]) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash64(tokens: Sequence[str]) -> int:
    """64-bit SimHash over tokens (unit weights)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    hv = _stable_hash64(list(tokens))
    for h in hv:
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def _stable_hash64(values: List[str]) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = np.uint64(0xCBF29CE484222325)
        for b in v.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
